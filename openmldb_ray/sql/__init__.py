"""SQL front-end: a parser + lowering layer for the OpenMLDB offline SQL
subset (SELECT / WHERE / GROUP BY / WINDOW / LAST JOIN / LEFT JOIN / LIMIT),
compiled onto the existing Ray Data stage API.

The reference's entire UX is SQL -> logical plan -> physical plan
(hybridse/src/vm/sql_compiler.cc:64-110, java/openmldb-batch/.../
SparkPlanner.scala:70-117).  This package rebuilds the *offline batch*
subset of that surface from scratch: text -> AST (parser.py) -> vectorized
Arrow expression evaluation (eval_expr.py) -> Ray Data pipeline (lower.py).
It exists so the reference's YAML conformance corpus
(cases/function/**/*.yaml) can be machine-run verbatim instead of
hand-transcribed query by query.
"""

from .parser import parse_sql  # noqa: F401


def sql_query(sql, tables, **kw):
    """Parse ``sql`` and lower it onto Ray Data over ``tables``
    ({name: Dataset}). See engine.py."""
    from .engine import run_sql

    return run_sql(sql, tables, **kw)
