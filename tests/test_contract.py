"""Driver-contract meta-tests: the registration invariants that every
operator addition must keep (a missed ORACLES entry silently downgrades a
query to the weaker rows-only check — caught here instead of in review)."""

import inspect

import __spark_entry__ as entry


def test_every_query_has_an_oracle():
    qs, oracles = entry.queries(), entry.oracle_sql()
    missing = sorted(set(qs) - set(oracles))
    assert not missing, f"queries without oracle SQL: {missing}"
    orphans = sorted(set(oracles) - set(qs))
    assert not orphans, f"oracles without a query: {orphans}"


def test_no_duplicate_names_across_modules():
    # dict.update silently overwrites; count registrations per module
    seen: dict[str, list[str]] = {}
    for mod in entry._MODULES:
        for name in getattr(mod, "QUERIES"):
            seen.setdefault(name, []).append(mod.__name__)
    dupes = {n: mods for n, mods in seen.items() if len(mods) > 1}
    assert not dupes, f"query names registered by multiple modules: {dupes}"


def test_query_callables_take_spark_and_sf_dir():
    for name, fn in entry.queries().items():
        params = list(inspect.signature(fn).parameters.values())
        assert len(params) >= 2, f"{name} must accept (spark, sf_dir)"
        extra = params[2:]
        assert all(
            p.default is not inspect.Parameter.empty for p in extra
        ), f"{name}: extra parameters must have defaults (driver passes two args)"


def test_oracles_are_nonempty_sql_strings():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_never_gated_queries_fit_the_driver_window():
    import glob
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gated: set[str] = set()
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        gated |= set(json.load(open(path)))
    keys = list(entry.queries())
    never = {k for k in keys if k not in gated}
    # the window cannot hold more never-gated queries than it has slots;
    # the invariant is ALLOCATION: no already-gated query may occupy a
    # window slot while a never-gated one waits outside
    window = keys[:50]
    wasted = [k for k in window if k not in never]
    waiting = [k for k in keys[50:] if k in never]
    assert not (wasted and waiting), (
        f"window slots spent on already-gated {wasted} while never-gated "
        f"{waiting} wait outside"
    )
