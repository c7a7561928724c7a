"""PySpark-native probabilistic stream/batch analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference stream processor (Bloom filters + Count-Min Sketch over Spark
Streaming), re-expressed Spark-first:

- relational surface: DataFrame / SQL, Catalyst does the planning
- probabilistic surface: Bloom filter, Count-Min Sketch, HLL, approx top-k,
  all as mergeable partial aggregates (commutative monoids) so they
  distribute across any number of executors
- streaming surface: Structured Streaming (windows, watermarks, stateful ops)
- LLM-data-pipeline surface: dedup (exact/MinHash-LSH/SimHash/n-gram),
  vector similarity search, text analysis, multimodal binary columns

Design target is a 1000-executor cluster over ~100 TB: every operator is
shuffle-based and mergeable; the only driver-side materializations are
kilobyte-scale sketches and final small results.
"""

__version__ = "0.1.0"

from bloom_filters_count_min_sketch_spark_streaming_spark.session import get_spark  # noqa: F401

# Public operator API — what a user of the reference engine would call.
from bloom_filters_count_min_sketch_spark_streaming_spark.functions.bloom import (  # noqa: F401
    BloomFilterSketch,
    NumpyBloom,
    bloom_build,
    bloom_might_contain,
)
from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cms import (  # noqa: F401
    CountMinSketchTable,
    NumpyCMS,
    cms_build,
    cms_estimate,
    exact_vs_approx,
)
from bloom_filters_count_min_sketch_spark_streaming_spark.functions.sketches import (  # noqa: F401
    approx_distinct,
    approx_quantiles,
    approx_top_k,
    exact_top_k,
    freq_items,
    histogram,
    hll_estimate,
)
from bloom_filters_count_min_sketch_spark_streaming_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from bloom_filters_count_min_sketch_spark_streaming_spark.operators.similarity import (  # noqa: F401
    ann_lsh_topk,
    centroids,
    cosine_topk_bruteforce,
    semdedup,
)
from bloom_filters_count_min_sketch_spark_streaming_spark.operators.bpe import (  # noqa: F401
    train_merges as bpe_train_merges,
)
from bloom_filters_count_min_sketch_spark_streaming_spark.operators.dedup import (  # noqa: F401
    duplicate_ngram_stats,
)
from bloom_filters_count_min_sketch_spark_streaming_spark.operators import quality  # noqa: F401
