"""gorilla_tsc_ray — a Ray-Data-native time-series rollup / downsample /
retention engine built from scratch around the Gorilla compression scheme
(Facebook Gorilla paper, VLDB'15), with the same codec semantics as the
reference Java library ``burmanm/gorilla-tsc`` (see docstring citations of
the form ``GorillaCompressor.java:NN`` which point into
``/root/reference/src/main/java/fi/iki/yak/ts/compression/gorilla/``).

Layout:
    codec/      bit-exact Gorilla v1/v2 codecs (streaming + NumPy-vectorized)
    sources/    Parquet readers + deterministic transcript synthesis
    stages/     map_batches / map_groups stage UDFs (metrics, encode, decode,
                rollup, dedup, similarity, text analysis, media stubs)
    pipelines/  end-to-end Ray Data pipelines (ingest/rollup, query, retention)
    state/      lineage + checkpoint bookkeeping
"""

__version__ = "0.1.0"
