from .investigation import (  # noqa: F401
    ADDITIONAL_DATA_MAX_ITEMS,
    LLM_CONTEXT_CHAR_LIMIT,
    InvestigationAgent,
    InvestigationResult,
    adjust_confidence,
    cap_items,
    extract_metrics,
    format_events_for_llm,
    truncate_context,
)
