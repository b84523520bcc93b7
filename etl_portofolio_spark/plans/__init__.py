"""Query plan library.

Each query is a function ``(spark, sf_dir) -> DataFrame`` building a
declarative DataFrame plan over the fixture tables, paired with an ANSI
SQL oracle (DuckDB-runnable) in the module-level ``ORACLE`` dicts.
"""
