"""IPython magics (SURVEY.md §2.12 M1-M4; reference:
``pandas_td/ipython.py`` — DatabasesMagics/TablesMagics/UseMagics/
QueryMagics, loci UNVERIFIED, /root/reference empty).

Reference surface reproduced:

* ``%td_databases [pattern]`` / ``%td_tables [pattern]`` — catalog listing
* ``%td_use <db>`` — set the default database
* ``%td_jobs`` — recent queries run through the compat engine
* ``%%td_presto`` / ``%%td_hive`` / ``%%td_sql`` — cell magics: run the
  cell's SQL with ``{var}`` substitution from the user namespace; options
  ``-o var`` (bind result), ``-n/--dry-run`` (print substituted SQL +
  plan), ``-q/--quiet``, ``-c/--connection var``.

IPython is an optional dependency: importing this module without IPython
is a no-op (``load_ipython_extension`` raises only when actually invoked).
The argument-parsing / substitution core is plain-Python and unit-tested
without a notebook (tests/test_magics.py), mirroring the reference's own
test split (SURVEY §5).
"""

from __future__ import annotations

import argparse
import shlex
from typing import Any

__all__ = ["parse_magic_args", "substitute_vars", "load_ipython_extension"]


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="%%td_sql", add_help=False)
    p.add_argument("-o", "--out", default=None, help="bind result to var")
    p.add_argument("-n", "--dry-run", action="store_true")
    p.add_argument("-q", "--quiet", action="store_true")
    p.add_argument("-c", "--connection", default=None)
    p.add_argument("engine_url", nargs="?", default=None)
    return p


def parse_magic_args(line: str) -> argparse.Namespace:
    """Reference: QueryMagics argparse setup (ipython.py ≈L200-330)."""
    return _parser().parse_args(shlex.split(line or ""))


def substitute_vars(sql: str, namespace: dict[str, Any]) -> str:
    """``{var}`` substitution from the user namespace (reference magics'
    templating). Uses str.format_map with a passthrough for unknown keys so
    SQL braces in literals don't explode."""

    class _Passthrough(dict):
        def __missing__(self, k):  # leave unknown {tokens} untouched
            return "{" + k + "}"

    return sql.format_map(_Passthrough(namespace))


def load_ipython_extension(ipython) -> None:  # pragma: no cover — notebook
    """``%load_ext pandas_td_spark.ipython``."""
    from IPython.core.magic import Magics, line_magic, cell_magic, magics_class

    import pandas_td_spark as td

    @magics_class
    class TdMagics(Magics):
        def __init__(self, shell):
            super().__init__(shell)
            self.con = td.connect()
            self.engine = td.create_engine("presto:default", con=self.con)

        @line_magic
        def td_use(self, line):
            self.engine = td.create_engine(f"presto:{line.strip()}", con=self.con)

        @line_magic
        def td_databases(self, line):
            return self.con.databases()

        @line_magic
        def td_tables(self, line):
            return self.con.tables(line.strip() or None)

        @line_magic
        def td_jobs(self, line):
            import pandas as pd

            return pd.DataFrame({"job_id": list(self.con._jobs)})

        def _run(self, line, cell):
            args = parse_magic_args(line)
            engine = self.engine
            con = self.con
            if args.connection:
                # reference magics' ``-c var``: use a Connection object from
                # the user namespace (isolated warehouse/session)
                if args.connection not in self.shell.user_ns:
                    from IPython.core.error import UsageError

                    raise UsageError(
                        f"-c: name {args.connection!r} is not defined in "
                        "the notebook namespace"
                    )
                con = self.shell.user_ns[args.connection]
            if args.engine_url:
                engine = td.create_engine(args.engine_url, con=con)
            elif args.connection:
                engine = td.create_engine(
                    f"{engine.type}:{engine.database}", con=con
                )
            sql = substitute_vars(cell, self.shell.user_ns)
            if args.dry_run:
                print(sql)
                return None
            result = td.read_td_query(sql, engine)
            if args.out:
                self.shell.user_ns[args.out] = result
            return None if args.quiet else result

        @cell_magic
        def td_sql(self, line, cell):
            return self._run(line, cell)

        @cell_magic
        def td_presto(self, line, cell):
            return self._run(line, cell)

        @cell_magic
        def td_hive(self, line, cell):
            return self._run(line, cell)

    ipython.register_magics(TdMagics)
