from .ingest import build_campaign_vectors, build_condition_vectors
from .nl_targeting import nl_targeting_conditions
from .recommend import recommend_similar_and_count

__all__ = [
    "build_campaign_vectors",
    "build_condition_vectors",
    "nl_targeting_conditions",
    "recommend_similar_and_count",
]
