"""ai_knowledge_etl_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of arctrany/ai-knowledge-etl.

Built from scratch on the Spark DataFrame API: the reference's
filters / relevance scoring / priority traversal / dedup / top-k /
hierarchical aggregation semantics become Catalyst-optimized column
expressions, joins, windows, and aggregations; the crawl frontier becomes an
iterative dataflow; the text pipeline (chunking with overlap, structure
extraction, summarization, similarity, near-duplicate detection, multimodal
binary columns) becomes a pandas-UDF/UDTF surface designed for 100 TB scale.

Layout:
    functions/   scalar column-expression kernels (urls, scoring, text, json)
    operators/   relational + LLM-data-pipeline operators (dedup, similarity,
                 chunking, top-k, joins, aggregates, batching)
    sources/     source connectors and the fixture-table catalog
    plans/       control-plane strategy operators (routing, fallback chains)
    streaming/   iterative crawl frontier + event-time windowed operators
    multimodal/  binary-column (image/audio) plumbing with stubbed decoders
"""

__version__ = "0.1.0"
