"""Agentic investigation loop — deterministic core (SURVEY §2.10 L1-L8).

Reference: tools/agentic_loop/investigation_agent.py (1,424 LoC). The
LLM call itself is an external service; everything around it is
deterministic and is what this module re-expresses Spark-first:

- L2 metric extraction + event formatting (:528-741):
  ``extract_metrics`` is five declarative DataFrame derivations (the
  reference loops rows in Python); ``format_events_for_llm`` aggregates
  distributed (counts, time range) and collects only the bounded heads
  (top-20 display, 5-per-metric examples) before string assembly.
- L4 confidence heuristics (:862-903): ``adjust_confidence`` is a pure
  function over (hypothesis, reasoning, events_text, confidence).
- L6 context budget (:239-240): ``LLM_CONTEXT_CHAR_LIMIT`` /
  ``ADDITIONAL_DATA_MAX_ITEMS`` enforced by ``truncate_context`` /
  ``cap_items``.
- L1/L3/L5 loop skeleton (:242-527): ``InvestigationAgent.investigate``
  iterates format -> llm -> adjust -> (optional tool calls) until the
  confidence threshold or max_iterations; the LLM is an injectable
  callable so the loop is fully testable offline.

Documented deviations from the reference (kept deliberately):
- the reference's display sort key ``-(sev) if sev>=40 else -1000``
  ascending actually puts sub-40 events FIRST (the -1000 sentinel sorts
  before any -sev); we mirror that observable behavior exactly;
- map-field display order: Python dicts preserve insertion order, Spark
  maps don't guarantee one, so displayed fields are key-sorted;
- ties in the display sort break on event_id (the reference relies on
  stable list order, which a distributed sort does not have).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.trace_logs import py_float

# reference: investigation_agent.py:239-240
LLM_CONTEXT_CHAR_LIMIT = 120_000
ADDITIONAL_DATA_MAX_ITEMS = 20

_LAG_KEYS = ["VersionLag", "versionLag", "VersionLagValue", "Lag", "lag"]


# ---------------------------------------------------------------------------
# L2 — metric extraction (declarative)
# ---------------------------------------------------------------------------


def extract_metrics(events: DataFrame) -> dict[str, DataFrame]:
    """Reference :528-605 as five DataFrame derivations. Each output is
    unmaterialized; the formatter takes bounded heads."""
    lag = F.coalesce(*[py_float(F.element_at("fields", F.lit(k))) for k in _LAG_KEYS])
    with_lag = events.withColumn("version_lag", lag)

    version_lag_spikes = with_lag.filter(F.col("version_lag") > 100_000).select(
        "event_id", "ts", F.col("event").alias("event_type"),
        "version_lag", "role", "severity",
    )
    high_lag_timestamps = with_lag.filter(F.col("version_lag") > 1_000_000).select(
        "event_id", "ts"
    )

    kv = events.select(
        "event_id", "ts", F.col("event").alias("event_type"), "role",
        F.explode(F.map_entries("fields")).alias("e"),
    ).select(
        "event_id", "ts", "event_type", "role",
        F.col("e.key").alias("metric"), py_float(F.col("e.value")).alias("val"),
        F.lower(F.col("e.key")).alias("__kl"), F.col("e.value").alias("__raw"),
    )
    negative_latencies = kv.filter(
        (
            F.col("__kl").contains("latency")
            | F.col("__kl").contains("min")
            | F.col("__kl").contains("max")
        )
        & F.col("val").isNotNull()
        & (F.col("val") < 0)
    ).select("event_id", "ts", "event_type", "metric", F.col("val").alias("value"), "role")

    slow_ss_loops = events.filter(F.col("event").contains("SlowSS")).select(
        "event_id", "ts", F.col("event").alias("event_type"), "severity", "fields"
    )

    throttling_reasons = kv.filter(
        (
            F.col("event_type").contains("RkUpdate")
            | F.col("event_type").contains("Ratekeeper")
        )
        & (F.col("__kl").contains("throttle") | F.col("__kl").contains("reason"))
    ).select(
        "event_id", "ts", "event_type",
        F.concat(F.col("metric"), F.lit(": "), F.col("__raw")).alias("reason"),
    )

    return {
        "version_lag_spikes": version_lag_spikes,
        "negative_latencies": negative_latencies,
        "slow_ss_loops": slow_ss_loops,
        "throttling_reasons": throttling_reasons,
        "high_lag_timestamps": high_lag_timestamps,
    }


# ---------------------------------------------------------------------------
# L2 — event formatting
# ---------------------------------------------------------------------------


def _iso(ts) -> str:
    return ts.isoformat() if ts is not None else "N/A"


def format_events_for_llm(events: DataFrame, display_limit: int = 20) -> str:
    """Reference :608-741. Counts/time-range are one distributed agg;
    only bounded heads are collected. Returns the exact report text shape
    the reference feeds the LLM."""
    stats = events.agg(
        F.count(F.lit(1)).alias("total"),
        F.count_if(F.coalesce(F.col("severity"), F.lit(0)) >= 40).alias("n40"),
        F.count_if(F.coalesce(F.col("severity"), F.lit(0)) == 30).alias("n30"),
        F.count_if(F.coalesce(F.col("severity"), F.lit(0)) == 20).alias("n20"),
        F.min("ts").alias("earliest"),
        F.max("ts").alias("latest"),
    ).collect()[0]
    if stats["total"] == 0:
        return "No events found."

    m = extract_metrics(events)
    spikes = m["version_lag_spikes"].orderBy("ts", "event_id").limit(1000).collect()
    crit = [r for r in spikes if r["version_lag"] > 1_000_000]
    negs = m["negative_latencies"].orderBy("ts", "event_id", "metric").limit(5).collect()
    n_negs = m["negative_latencies"].count()
    slows = m["slow_ss_loops"].orderBy("ts", "event_id").limit(3).collect()
    n_slows = m["slow_ss_loops"].count()
    throts = m["throttling_reasons"].orderBy("ts", "event_id", "reason").limit(5).collect()
    n_throts = m["throttling_reasons"].count()

    sev = F.coalesce(F.col("severity"), F.lit(0))
    sort_key = F.when(sev >= 40, -sev).otherwise(F.lit(-1000))
    display = (
        events.withColumn("__k", sort_key)
        .orderBy("__k", F.col("ts").asc_nulls_last(), "event_id")
        .limit(display_limit)
        .collect()
    )

    lines: list[str] = []
    lines.append(f"Found {stats['total']} events:")
    lines.append(f"  - Severity 40+ (Errors): {stats['n40']}")
    lines.append(f"  - Severity 30 (Info): {stats['n30']}")
    lines.append(f"  - Severity 20 (Warnings): {stats['n20']}")
    lines.append("")
    lines.append("=" * 70)
    lines.append("CRITICAL: PRIORITIZE METRICS OVER EVENT SEVERITY")
    lines.append("=" * 70)
    lines.append("")
    lines.append("METRICS ARE MORE IMPORTANT THAN EVENT SEVERITY!")
    lines.append("   - VersionLag spikes (>100k, especially >1M) indicate storage pressure")
    lines.append("   - Negative latencies indicate timing bugs/overflows")
    lines.append("   - Throttling reasons show performance degradation")
    lines.append("   - SlowSSLoop indicates storage server performance issues")
    lines.append("")
    lines.append("Do NOT treat Severity 20/30 events as root cause by themselves")
    lines.append("   Focus on the METRIC anomalies behind them.\n")

    if spikes:
        lines.append("VERSIONLAG SPIKES (Storage Engine Pressure):")
        lines.append(f"   Found {len(spikes)} events with VersionLag > 100k")
        shown = crit if crit else spikes
        if crit:
            lines.append(f"   {len(crit)} events with VersionLag > 1M (CRITICAL)")
        for r in shown[:5]:
            lines.append(
                f"      - {_iso(r['ts'])}: VersionLag={r['version_lag']:.0f} "
                f"(event: {r['event_type']})"
            )
        lines.append("")
    if n_negs:
        lines.append("NEGATIVE LATENCIES (Timing Bug/Overflow):")
        lines.append(f"   Found {n_negs} negative latency values")
        for r in negs:
            lines.append(
                f"      - {_iso(r['ts'])}: {r['metric']}={r['value']} "
                f"(event: {r['event_type']})"
            )
        lines.append("")
    if n_slows:
        lines.append("SLOW SS LOOPS (Storage Server Performance):")
        lines.append(f"   Found {n_slows} SlowSSLoop events")
        for r in slows:
            lines.append(f"      - {_iso(r['ts'])}: {r['event_type']}")
        lines.append("")
    if n_throts:
        lines.append("THROTTLING DETECTED (Performance Degradation):")
        lines.append(f"   Found {n_throts} throttling events")
        for r in throts:
            lines.append(f"      - {_iso(r['ts'])}: {r['reason']}")
        lines.append("")

    lines.append("=" * 70)
    lines.append("EVENT DETAILS (context; metrics above are higher-signal)")
    lines.append("=" * 70)
    lines.append("")
    if stats["earliest"] is not None:
        span = (stats["latest"] - stats["earliest"]).total_seconds()
        lines.append(
            f"Time range: {stats['earliest'].isoformat()} to "
            f"{stats['latest'].isoformat()} ({span:.1f} seconds)\n"
        )
    lines.append(f"Top {len(display)} events:\n")
    for i, ev in enumerate(display, 1):
        s = ev["severity"] or 0
        indicator = " CRITICAL ERROR" if s >= 40 else (" WARNING" if s == 20 else "")
        fields = dict(sorted((ev["fields"] or {}).items()))
        if len(fields) <= 5:
            fields_str = json.dumps(fields, indent=2)
        else:
            top = dict(list(fields.items())[:5])
            fields_str = json.dumps(top, indent=2) + "\n    ... (truncated)"
        level = "ERROR" if s >= 40 else ("WARNING" if s == 20 else "INFO")
        lines.append(
            f"\nEvent {i}{indicator}:\n"
            f"  Timestamp: {_iso(ev['ts'])}\n"
            f"  Event Type: {ev['event']}\n"
            f"  Severity: {ev['severity']} ({level})\n"
            f"  Role: {ev['role'] or 'N/A'}\n"
            f"  Fields:\n{fields_str}\n"
        )
    if stats["total"] > len(display):
        lines.append(f"\n... and {stats['total'] - len(display)} more events")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# L4 — confidence heuristics (pure)
# ---------------------------------------------------------------------------

_METRIC_FOCUS = [
    "versionlag", "version_lag", "lag", "latency", "throttle", "throttl",
    "slowss", "metric", "storage pressure", "performance", "degradation",
]
_EVENT_NAME_FOCUS = [
    "fkreenablelb", "file not found", "severity 30", "severity 20", "informational",
]
_METRIC_ANOMALY_MARKERS = [
    "versionlag spike", "negative latenc", "slowssloop", "throttling", ">100k", ">1m",
]


def adjust_confidence(
    hypothesis: str, reasoning: str, events_text: str, confidence: float
) -> tuple[float, str]:
    """Reference :862-903 verbatim logic: cap confidence when the
    hypothesis chases event names while metric anomalies exist; boost
    (capped at 1.0) when it correctly focuses on metrics."""
    blob = (hypothesis + reasoning).lower()
    has_metric_focus = any(k in blob for k in _METRIC_FOCUS)
    event_name_focus = any(k in hypothesis.lower() for k in _EVENT_NAME_FOCUS)
    has_metric_anomalies = any(k in events_text.lower() for k in _METRIC_ANOMALY_MARKERS)

    if event_name_focus and not has_metric_focus and has_metric_anomalies:
        return min(confidence, 0.4), (
            "[Confidence reduced: Metrics detected but hypothesis focuses on "
            "event names. Metrics are more important than event severity.] " + reasoning
        )
    if event_name_focus and not has_metric_focus:
        return min(confidence, 0.5), (
            "[Confidence adjusted: Hypothesis focuses on event names rather "
            "than metrics] " + reasoning
        )
    if has_metric_focus and has_metric_anomalies:
        return min(confidence + 0.1, 1.0), (
            "[Confidence boosted: Hypothesis correctly focuses on metrics] " + reasoning
        )
    return confidence, reasoning


# ---------------------------------------------------------------------------
# L6 — context budget (pure)
# ---------------------------------------------------------------------------


def truncate_context(text: str, limit: int = LLM_CONTEXT_CHAR_LIMIT) -> str:
    """Hard character budget on the LLM context (reference :239)."""
    if len(text) <= limit:
        return text
    marker = "\n... [truncated to context limit]"
    return text[: limit - len(marker)] + marker


def cap_items(items: list, limit: int = ADDITIONAL_DATA_MAX_ITEMS) -> list:
    """Additional-data item cap (reference :240)."""
    return items[:limit]


# ---------------------------------------------------------------------------
# L1/L3/L5 — loop skeleton with injectable LLM
# ---------------------------------------------------------------------------


@dataclass
class InvestigationResult:
    hypothesis: str
    confidence: float
    reasoning: str
    tools_used: list = field(default_factory=list)
    iterations: int = 0


class InvestigationAgent:
    """Iterative investigate loop: format -> llm -> adjust -> tools.

    ``llm(prompt: dict) -> dict`` is injectable (keys: events_text,
    question, hypothesis, confidence; returns hypothesis/confidence/
    reasoning/suggested_tools). ``tools`` maps tool names to callables
    ``tool(events: DataFrame) -> DataFrame`` whose bounded summary is
    appended to the next iteration's context."""

    def __init__(
        self,
        llm,
        tools: dict | None = None,
        max_iterations: int = 10,
        confidence_threshold: float = 0.8,
    ):
        self.llm = llm
        self.tools = tools or {}
        self.max_iterations = max_iterations
        self.confidence_threshold = confidence_threshold

    def investigate(self, events: DataFrame, question: str) -> InvestigationResult:
        events_text = truncate_context(format_events_for_llm(events))
        hypothesis, confidence, reasoning = "", 0.0, ""
        tools_used: list[str] = []
        iterations = 0
        extra = ""

        for _ in range(self.max_iterations):
            iterations += 1
            out = self.llm(
                {
                    "events_text": truncate_context(events_text + extra),
                    "question": question,
                    "hypothesis": hypothesis,
                    "confidence": confidence,
                }
            )
            hypothesis = out.get("hypothesis", "")
            confidence = float(out.get("confidence", 0.0))
            reasoning = out.get("reasoning", "")
            confidence, reasoning = adjust_confidence(
                hypothesis, reasoning, events_text, confidence
            )
            if confidence >= self.confidence_threshold:
                break
            for name in cap_items(out.get("suggested_tools", [])):
                fn = self.tools.get(name)
                if fn is None or name in tools_used:
                    continue
                tools_used.append(name)
                head = fn(events).limit(ADDITIONAL_DATA_MAX_ITEMS).collect()
                extra += f"\n\n[{name}] " + json.dumps(
                    [r.asDict(recursive=True) for r in head], default=str
                )
        return InvestigationResult(
            hypothesis=hypothesis,
            confidence=confidence,
            reasoning=reasoning,
            tools_used=tools_used,
            iterations=iterations,
        )
