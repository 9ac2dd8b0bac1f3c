"""table_annotation_ray — a Ray-Data-native knowledge-graph construction engine.

From-scratch re-expression of the computations of
Orange-OpenSource/Table-Annotation (DAGOBAH) — table preprocessing,
fuzzy entity lookup, CEA/CTA/CPA disambiguation — as a streaming
triple-extraction DAG over Parquet tables of multi-turn conversation
transcripts, built on ``ray.data.Dataset`` / ``map_batches`` / actor
pools.  Nothing in here is a port: the reference (see /root/reference,
cited per-module as file:line) defines WHAT is computed; the execution
model is idiomatic Ray Data.

Layout:
    functions/   pure scalar/vector functions (fuzzy ratios, typing parsers, dates, quantities)
    stages/      map_batches / map_groups stages (clean, typing, lookup, annotate, triples, dedup, ...)
    state/       stateful backends (mini-KB, label index) loaded once per actor
    sources/     readers (parquet transcripts, delimited text with sniffing)
    pipelines/   end-to-end DAG assembly (transcripts -> triples)
    synth.py     deterministic synthetic transcript + mini-KB generators
"""

__version__ = "0.1.0"
