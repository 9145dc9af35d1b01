"""Large-scale training-data pipeline operators (beyond the reference's
dialect): dedup, similarity search, text analysis, multimodal plumbing.

All operators are DataFrame→DataFrame transforms designed for 100 TB
inputs: Catalyst expressions in the hot path, broadcast for small sides,
explicit candidate blocking (LSH bands / hyperplane buckets) instead of
all-pairs joins.
"""

from openmldb_spark.pipeline.text import text_features  # noqa: F401
from openmldb_spark.pipeline.dedup import (  # noqa: F401
    exact_dedup, minhash_signatures, minhash_lsh_pairs, simhash,
    ngram_jaccard_pairs, embedding_near_dup_pairs, dedup_components,
)
from openmldb_spark.pipeline.similarity import (  # noqa: F401
    brute_force_topk, ivf_topk, lsh_bucketed_topk,
)
from openmldb_spark.pipeline.sampling import (  # noqa: F401
    cap_per_key, downsample, split_column,
)
from openmldb_spark.pipeline.decontam import (  # noqa: F401
    contamination_scores,
)
from openmldb_spark.pipeline.packing import (  # noqa: F401
    pack_chunks,
    pack_offsets,
)
