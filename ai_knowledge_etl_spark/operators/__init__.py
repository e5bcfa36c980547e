"""Relational + LLM-data-pipeline operators.

Each module exposes DataFrame→DataFrame functions built on Catalyst
primitives; anything needing imperative per-group logic drops to
Arrow-batched `applyInPandas` — never row-at-a-time Python UDFs.
"""
