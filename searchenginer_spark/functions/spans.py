"""Token-span interval math shared by the dedup and textstats families.

One pure-Catalyst fold: sorted gram-start positions -> maximal merged
[p, p+L) intervals. Used by operators/dedup.duplicated_spans (ExactSubstr
span output) and functions/textstats.repetition_signals (duplicated-n-gram
character coverage) — one implementation so the merge rule (adjacent
intervals merge: p == last.e is contiguous) can never diverge between them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def merge_token_spans(ps: Column, L: int) -> Column:
    """array<int> sorted gram starts -> array<struct<s,e>> maximal merged
    [p, p+L) intervals. Per-element linear; CaseWhen branch order guards
    the ANSI-mode element_at(-1) on the empty accumulator."""
    empty = F.expr("CAST(array() AS array<struct<s:int,e:int>>)")

    def step(acc, p):
        last = F.element_at(acc, -1)
        s = p.cast("int")
        e = (p + L).cast("int")
        opened = F.concat(acc, F.array(F.struct(s.alias("s"), e.alias("e"))))
        extended = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(F.struct(last["s"].alias("s"), e.alias("e"))),
        )
        return F.when(F.size(acc) == 0, opened).when(p > last["e"], opened).otherwise(extended)

    return F.aggregate(ps, empty, step)
