"""Full-registry breadth timing (VERDICT r5 item 4): run EVERY
queries() entry at a given SF dir and record wall seconds per entry as
JSONL (streamed, so partial progress survives a kill).

Usage: python scripts/bench_registry.py SF_DIR OUT.jsonl [--skip a,b,c] [--only a,b,c] [--resume]

--only restricts the sweep to the named entries (targeted probes, e.g.
the sf100 scale-shape subset) instead of the whole registry.

--resume appends to OUT.jsonl and skips entries it already records
(timed or errored), so a killed sweep continues where it stopped.

Timing covers building the DataFrame (for streaming entries the
availableNow drain happens here) plus a noop-sink write of the result —
the full distributed plan, no driver materialization. This is a
breadth/regression sweep, not the headline bench: cold plans, no table
cache, session.py defaults (AQE on, shuffle partitions = cores).

Known-quadratic entries are skipped BY DEFAULT at replica-scaled SFs
(pass --skip "" to force): the scale dirs are built by
make_scale_data.py as N verbatim replicas of sf0.1, so every document
has N-1 exact clones — the uncapped m02/m08 shingle index is quadratic
in clone count BY DESIGN (their capped twins m02c/m08c are the shapes
meant for this regime and do run here).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from db_loganalyzer_spark.session import get_spark

DEFAULT_SKIP = {"m02_ngram_jaccard", "m08_dedup_components"}


def main():
    args = sys.argv[1:]
    resume = "--resume" in args
    if resume:
        args.remove("--resume")
    skip = DEFAULT_SKIP
    if "--skip" in args:
        i = args.index("--skip")
        if i + 1 >= len(args):
            sys.exit("--skip requires a value (use --skip \"\" for none)")
        skip = {s for s in args[i + 1].split(",") if s}
        del args[i : i + 2]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        if i + 1 >= len(args):
            sys.exit("--only requires a comma-separated entry list")
        only = {s for s in args[i + 1].split(",") if s}
        del args[i : i + 2]
    if any(a.startswith("--") for a in args):
        sys.exit(f"unknown flag(s): {[a for a in args if a.startswith('--')]}")
    sf_dir = args[0]
    out_path = args[1]

    done: set[str] = set()
    if resume and os.path.exists(out_path):
        for line in open(out_path):
            try:
                done.add(json.loads(line)["query"])
            except Exception:
                pass

    spark = get_spark("bench-registry")
    qs = entry_mod.queries()
    with open(out_path, "a" if resume else "w") as out:
        for name, fn in qs.items():
            if only is not None and name not in only:
                continue
            if name in done:
                continue
            if name in skip:
                out.write(
                    json.dumps(
                        {
                            "query": name,
                            "skipped": "uncapped quadratic under replica clones;"
                            " capped twin runs instead",
                        }
                    )
                    + "\n"
                )
                out.flush()
                continue
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                rec = {
                    "query": name,
                    "sec": round(time.time() - t0, 2),
                }
            except Exception as e:  # record and keep sweeping
                rec = {
                    "query": name,
                    "sec": round(time.time() - t0, 2),
                    "error": f"{type(e).__name__}: {str(e)[:200]}",
                }
            out.write(json.dumps(rec) + "\n")
            out.flush()
            _release_persisted(spark)
    spark.stop()


def _release_persisted(spark):
    """Sweep hygiene: several dedup/LSH operators persist intermediate
    frames and deliberately leave eviction to LRU (correct for a caller
    reusing the plan — see ngram_jaccard_pairs). A 160-entry sweep
    session is the one place those caches accumulate with no reuse, so
    drop them between entries instead of leaning on storage-memory
    pressure."""
    try:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
    except Exception:
        pass  # cosmetic only — LRU eviction remains the fallback


if __name__ == "__main__":
    main()
