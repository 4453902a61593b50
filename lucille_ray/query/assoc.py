"""Mixed AND/OR chain association — Python realization of the reference's one-ahead
accumulator algorithm (internal/Op.scala:34-107).

AND binds tighter than OR; runs of the same operator collapse into one n-ary node
(no nesting). Exact outputs are locked by the ported OpSuite / AssociativitySuite
tests (internal/OpSuite.scala:23-81, AssociativitySuite.scala:43-159).
"""

from __future__ import annotations

from enum import Enum
from typing import List, Tuple

from .nodes import And, Or, Query


class Op(Enum):
    OR = "OR"
    AND = "AND"


def associate_ops(first: Query, op_qs: List[Tuple[Op, Query]]) -> Query:
    """Associate ``first OP q1 OP q2 ...`` into a single top-level Or/And tree.

    Mirrors Op.associateOps (internal/Op.scala:34-107): accumulate queries while the
    operator stays the same; on OR->AND switch, flush the accumulator *before* the
    current query (the AND island captures it); on AND->OR switch, flush *after*
    collapsing the accumulated run into an And node.
    """
    if not op_qs:
        return first

    (current_op, current_q), remaining = op_qs[0], op_qs[1:]
    acc: List[Query] = [first]
    out: List[Query] = []

    for next_op, next_q in remaining:
        if current_op == next_op:
            acc.append(current_q)
        elif next_op is Op.AND:
            # OR -> AND: previous OR operands stand alone; current_q starts the island
            out.extend(acc)
            acc = [current_q]
        else:
            # AND -> OR: current_q completes the AND run
            acc.append(current_q)
            out.append(And(tuple(acc)))
            acc = []
        current_op, current_q = next_op, next_q

    acc.append(current_q)
    if current_op is Op.AND:
        out.append(And(tuple(acc)))
    else:
        out.extend(acc)

    if len(out) == 1:
        return out[0]
    return Or(tuple(out))
