"""Higher-order-function helpers for Spark SQL column expressions.

Catalyst does NOT share subexpressions across lambda invocations: a
lambda body that references an outer column *expression* (rather than a
plain attribute or its own lambda variable) re-evaluates that expression
for every array element the higher-order function visits. An O(d)
reduction (array_min, a norm fold) referenced inside an O(d) transform
silently becomes O(d^2) per row — measured 8x on 5-gram construction
(operators/text.py word_ngrams) and d-fold on vector normalization.

``let_bind`` makes the binding explicit: evaluate the expression ONCE
per row by passing it through a one-element ``transform`` whose lambda
variable the body then references.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_bind(expr: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``expr`` once and hand it to ``body`` as a bound lambda
    variable — the SQL-expression analogue of ``let x = expr in body(x)``.

    Use whenever ``body`` embeds the value inside another higher-order
    lambda; referencing ``expr`` directly there would re-evaluate it per
    element. Bind a struct to carry several values at once (field access
    on a bound variable is O(1))."""
    return F.get(F.transform(F.array(expr), body), 0)
