"""Multimodal columns (north-star: BASELINE.json l.6).

Image/audio/video payloads are opaque `binary` columns with typed metadata
structs; decode/feature-extract kernels are Arrow-batched pandas UDFs whose
heavy libraries are import-gated (this container ships none, so the decode
step is a clearly marked stub — the Spark-side plumbing, schemas, batch
shapes and error-as-data contracts are real and tested).
"""
