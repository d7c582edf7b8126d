"""Dump each named entry's formatted physical plan to its own file —
the per-query before/after artifacts the optimization rounds commit
under plans/rNN/.

Usage: python scripts/dump_plan_files.py SF_DIR OUT_DIR SUFFIX name1,name2,...
Writes OUT_DIR/<name>_<SUFFIX>.txt per entry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from db_loganalyzer_spark.session import get_spark


def main():
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4].split(",")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plan-files")
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as out:
            out.write(f"== {name} @ {sf_dir} ==\n{plan}\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
