"""L7 — static failure-cluster knowledge base.

Reference: tools/agentic_loop/investigation_agent.py:31-117 (the
``FDB_KNOWLEDGE_BASE`` prompt asset; same taxonomy in
log_analysis/knowledge_base_template.py and
rag-corpus/reasoning-docs/cluster_definitions.md). Cluster ids and names
are semantic constants and must match the reference exactly (the LLM is
instructed to cite "CLUSTER <id>" inline); the prose is condensed here —
the indicators are the load-bearing part for matching.

Note the reference taxonomy has no clusters 1-3; the gap is preserved.
"""

from __future__ import annotations

CLUSTERS: list[dict] = [
    {
        "id": 0,
        "name": "recovery_restart_cascade",
        "problem": "Recovery loops, restarting before completion due to coordinator state conflicts.",
        "indicators": [
            "reading_coordinated_state retries", "coordinator mismatch",
            "generation conflicts", "Aborting current recovery",
        ],
    },
    {
        "id": 4,
        "name": "transaction_tag_throttling",
        "problem": "Tag throttling during recovery blocks GRV requests, stalling progress.",
        "indicators": [
            "TAG_THROTTLED", "tag budget exhausted", "GRV queue length high",
            "GRV timeouts", "recovery slowed by throttling",
        ],
    },
    {
        "id": 5,
        "name": "tlog_failure_recovery",
        "problem": "TLog failure/degradation forces recovery; commits cannot persist safely.",
        "indicators": [
            "TLog failed", "TLog degraded", "high disk latency", "partial commit",
            "TLog excluded", "stopped by CC recovery", "acknowledge timeout",
        ],
    },
    {
        "id": 6,
        "name": "storage_engine_pressure",
        "problem": "Post-recovery memory/disk pressure sharply reduces throughput.",
        "indicators": [
            "KeyValueStoreMemory switching to large txn", "memory over limit",
            "DiskQueue not durable", "high fsync latency", "throughput reduction",
            "after recovery completion",
        ],
    },
    {
        "id": 7,
        "name": "commit_proxy_pipeline_crash",
        "problem": "Commit proxy/resolver crash breaks the pipeline; master terminates.",
        "indicators": [
            "proxy crash", "resolver unresponsive", "failed to progress",
            "pipeline broken", "master terminated", "master failure detected",
        ],
    },
    {
        "id": 8,
        "name": "network_partition_recovery",
        "problem": "Partition isolates components, prevents quorum, risks split-brain.",
        "indicators": [
            "coordinator unreachable", "connection timeout", "quorum lost",
            "network unreachable", "split-brain", "simultaneous communication failures",
        ],
    },
    {
        "id": 9,
        "name": "configuration_change_recovery",
        "problem": "Config change (nodes/replication) triggers instability requiring recovery.",
        "indicators": [
            "exclude", "include", "configuration change in progress",
            "redundancy mode change", "version mismatch", "coordinator set update",
        ],
    },
    {
        "id": 10,
        "name": "clock_skew_recovery",
        "problem": "Clock differences cause version-order violations and lease confusion.",
        "indicators": [
            "clock skew", "NTP sync failure", "time jumped backward",
            "version ordering violation", "lease expiration anomaly", "timestamps out of order",
        ],
    },
    {
        "id": 11,
        "name": "data_corruption_recovery",
        "problem": "Corruption in storage/logs/metadata forces recovery from replicas.",
        "indicators": [
            "checksum mismatch", "corruption detected", "invalid data", "replica repair",
        ],
    },
    {
        "id": 12,
        "name": "resource_exhaustion_recovery",
        "problem": "OS-level resource exhaustion (fds, ports, threads) prevents operation.",
        "indicators": [
            "Too many open files", "Cannot allocate memory", "port exhaustion",
            "thread creation failed", "ENOMEM", "EMFILE", "EAGAIN",
        ],
    },
    {
        "id": 13,
        "name": "workload_spike_recovery",
        "problem": "Workload surge overwhelms the cluster: queue overflow, timeout cascades.",
        "indicators": [
            "traffic spike", "high load", "queue overflow", "retry storm",
            "timeout cascade", "rejecting requests due to overload",
        ],
    },
    {
        "id": 14,
        "name": "upgrade_rollback_recovery",
        "problem": "Upgrade fails or is incompatible, requiring rollback.",
        "indicators": [
            "version mismatch", "protocol incompatibility", "rollback in progress",
            "mixed versions", "data format migration error",
        ],
    },
    {
        "id": 15,
        "name": "cascading_failure_recovery",
        "problem": "One failure triggers a chain reaction across the cluster.",
        "indicators": [
            "multiple components failing in succession", "load redistribution failure",
            "timeout cascades across components", "avalanche pattern",
        ],
    },
    {
        "id": 16,
        "name": "lease_expiration_recovery",
        "problem": "Master lease expires or renewal fails; new election and recovery.",
        "indicators": [
            "lease expiration", "failed to renew lease", "master lease loss",
            "master election", "GC pause exceeding lease timeout",
        ],
    },
]


def knowledge_base_text() -> str:
    """Render the taxonomy in the reference's prompt shape (## CLUSTER n:
    name / Problem / Key Indicators)."""
    lines = ["# FoundationDB Recovery Cluster Knowledge Base"]
    for c in CLUSTERS:
        lines.append("")
        lines.append(f"## CLUSTER {c['id']}: {c['name']}")
        lines.append(f"Problem: {c['problem']}")
        lines.append("Key Indicators: " + ", ".join(c["indicators"]) + ".")
    return "\n".join(lines)
