"""mapreduce511_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the
``Littleleii/MapReduce511`` reference (a Hadoop-MapReduce WordCount
performance-study harness: WordCount batch dataflow + log/telemetry
analytics, see ``/root/reference``) as idiomatic Spark DataFrame
pipelines, plus the LLM-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal columns) required for 100 TB scale.

Layout:
    session     tuned SparkSession factory
    sources     table loaders + ordered text-log readers
    functions   scalar/array helpers (tokenize, vectors, time)
    operators   wordcount, dedup, similarity, sessionization, top-k
    plans       log-analytics pipelines (monitor, progress, stages,
                counters, experiment-tree scan, reports, charts)
    streaming   Structured Streaming analogs of the live monitor
    multimodal  binary-column conventions + stubbed decoders
"""

__version__ = "0.1.0"
