"""Higher-order-function helpers.

Spark evaluates higher-order functions (``transform``/``filter``/``aggregate``)
in interpreted mode, and a lambda body that *captures an outer expression tree*
(e.g. ``split(text)``) re-evaluates that tree for **every array element**. On a
300-char document whose lambda captures a regex split, that turns O(n) shingle
generation into O(n²) regex work — measured 8-10× end-to-end slowdowns at
sf0.1 and arbitrarily worse on longer documents.

``let`` binds an expression ONCE per row (as the sole element of a transient
single-element array) and hands the lambda a plain variable reference, which
the interpreter evaluates O(1) per use. This is the expression-level analog of
materializing the column with ``withColumn`` first, usable inside pure-Column
APIs where no DataFrame is available.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(bound: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``bound`` once per row and pass it to ``body`` as a variable.

    ``let(F.split(text, " "), lambda words: ...words[i]...)`` guarantees the
    split runs once per row, no matter how many times the lambda references
    ``words``.
    """
    return F.transform(F.array(bound), body)[0]
