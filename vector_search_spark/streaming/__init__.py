from .fusion import fused_scores
from .stateful import stateful_user_totals, stream_dedup
from .windows import session_agg, sliding_agg, stream_events, tumbling_agg

__all__ = [
    "fused_scores",
    "session_agg",
    "sliding_agg",
    "stateful_user_totals",
    "stream_dedup",
    "stream_events",
    "tumbling_agg",
]
