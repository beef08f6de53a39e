"""curator_spark — a PySpark-native rebuild of curator-style data curation.

A brand-new quality-filter engine over conversation-transcript tables:
language ID, n-gram perplexity, Gopher/C4 heuristic rules, and
compiled-regex PII/toxicity scrubbing, executed as vectorized
pandas/Arrow UDFs on Spark DataFrames, with per-partition checkpointing,
lineage, and counter metrics.

Capability parity target: alchemz/curator (bespokelabs-curator 0.1.16);
see SURVEY.md for the operator-by-operator mapping. This is a
Spark-first re-expression, not a port: the reference's per-row asyncio
dataflow (reference: src/bespokelabs/curator/request_processor/online/
base_online_request_processor.py:237-370) becomes a declarative
DataFrame plan whose physical strategy Catalyst picks.
"""

__version__ = "0.1.0"
