"""Attribute store + mixer — the Dolma architecture for corpus
curation at 100 TB: TAGGERS compute per-document attributes (quality
flags, scores, language, dedup keys) ONCE and write them to a compact
side table aligned on doc_id; MIXERS then combine attributes with a
boolean rule to materialize a filtered corpus view. The 100 TB corpus
text is never rewritten when a curation rule changes — re-mixing reads
only the attribute table (a few numeric columns per doc, ~1% of the
corpus bytes) plus the final join back.

Why this shape matters at scale: every rule iteration a team does
("raise the quality floor", "swap the langid threshold") becomes a
metadata-sized job instead of a corpus rewrite, and attributes from
different taggers (different teams, different runs) compose by
doc_id-equi-join without coordination. This generalizes the engine's
per-query filters the same way the commit log generalizes its writes.

Reference parity: the reference stores per-row curation outcomes
inline with the response payload (parsed response columns in its
cached dataset); the attribute table is that record decoupled from
the text so it can be recomputed and recombined independently.

Plan shapes:
* tag(): one narrow projection over the corpus — attribute columns
  are Column expressions (JVM codegen or the existing Arrow-batched
  scorers), zero shuffle; write bucketed by the same key as the
  corpus for a colocated re-join.
* mix(): the rule is evaluated on the ATTRIBUTE table (small), then
  the surviving doc_ids equi-join back to the corpus — broadcastable
  when the survivor set is small, colocated when bucketed; never a
  corpus-wide rule evaluation over the text.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["tag", "mix", "combine_attribute_tables"]


def tag(docs: DataFrame, taggers: Mapping[str, Column],
        id_col: str = "doc_id") -> DataFrame:
    """Run taggers → the attribute table (id + one column per
    attribute). Each tagger is a Column expression over the doc row
    (pyspark.sql.functions or a pandas-UDF scorer output) — the whole
    tag pass is one projection, no shuffle. Attribute names must not
    collide with the id column."""
    bad = [n for n in taggers if n == id_col]
    if bad:
        raise ValueError(f"attribute name collides with id: {bad}")
    return docs.select(id_col,
                       *[c.alias(n) for n, c in taggers.items()])


def combine_attribute_tables(tables: list[DataFrame],
                             id_col: str = "doc_id") -> DataFrame:
    """Outer-join attribute tables from independent tagger runs on the
    id — teams tag independently, rules read the union. Column name
    collisions are an error (attributes are namespaced by convention:
    'quality__n_tokens', 'dedup__is_canonical', ...)."""
    if not tables:
        raise ValueError("no attribute tables")
    out = tables[0]
    seen = set(out.columns)
    for t in tables[1:]:
        dup = (set(t.columns) - {id_col}) & seen
        if dup:
            raise ValueError(f"attribute name collision: {sorted(dup)}")
        seen |= set(t.columns)
        out = out.join(t, id_col, "outer")
    return out


def mix(docs: DataFrame, attrs: DataFrame, rule: Column,
        id_col: str = "doc_id", broadcast_survivors: bool = False
        ) -> DataFrame:
    """Materialize the curated view: evaluate `rule` (a boolean Column
    over attribute columns) on the attribute table, then semi-join the
    survivors back onto the corpus. The rule never touches the text;
    the only corpus-sized operation is the final equi-join (broadcast
    the survivor ids when the rule is selective, colocated/bucketed
    otherwise). NULL attributes fail the rule (missing evidence ≠
    pass), matching SQL three-valued logic."""
    survivors = attrs.filter(rule).select(id_col)
    if broadcast_survivors:
        survivors = F.broadcast(survivors)
    return docs.join(survivors, id_col, "left_semi")
