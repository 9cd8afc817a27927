"""Local stand-in for the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` counterpart on DuckDB over the same parquet tables, then
compares row count, column names, and an order-insensitive value
normalization. Use while iterating:

    python tools/check_correctness.py [--ansi] [--outside-window]
        [--batch N] [--duckdb-mem LIMIT] [sf_dir] [query ...]

``--outside-window`` restricts the run to the queries AFTER the
driver's 50-entry gate window (registration order) — the round-robin
re-verification leg for old green rows nothing else re-checks.

``--batch N`` (r14 verdict item #2) runs the selected queries in
FRESH CHILD PROCESSES of N queries each instead of one long-lived
process: the r13 sf0.1 full-registry sweep exhausted the allocator
(DuckDB OOM / python malloc) after ~300 queries in one process, and a
sweep that needs manual re-runs can mask a real per-query memory
regression. Each child gets a fresh JVM + fresh DuckDB connection;
the parent aggregates the children's pass/weak/fail totals and exits
nonzero if ANY child failed or crashed. ~10 s JVM startup per chunk.

``--duckdb-mem LIMIT`` (default 24GB) applies ``SET memory_limit`` to
the DuckDB connection so one oracle cannot balloon the checker; DuckDB
spills to temp instead past the ceiling.

``--ansi`` runs the Spark side under ``spark.sql.ansi.enabled=true`` —
the DRIVER's environment (Spark 4 defaults ANSI ON; the repo's own
session pins it OFF), which is how `label_confusion_report`'s
DIVIDE_BY_ZERO crash reached round 5's driver unseen. Run BOTH legs
before a snapshot.

Beyond value equality, every query also gets a DTYPE-PAIRING check:
the oracle result's pandas dtype class must match the Spark schema's
class (bigint↔int64, double/decimal↔float64, string↔object). The
driver's hash canonicalization distinguishes DuckDB HUGEINT columns
(rendered float64, ``70.0``) from Spark BIGINT (``70``) even when the
local %.17g normalization masks it — exactly the r4/r5
`embedding_rp_reduce` / `label_agreement_kappa` red rows.
"""

from __future__ import annotations

import math
import os
import sys
import time
from decimal import Decimal

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full precision (17 sig figs round-trips any double) — the driver's
        # gate hashes full-precision values, so the local check must too;
        # `v + 0.0` kills -0.0
        return f"{v + 0.0:.17g}"
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def normalize_df(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(normalize_cell(row[c]) for c in cols) for _, row in pdf[cols].iterrows()]
    return cols, sorted(rows)


def dtype_class(dtype_str: str) -> str:
    """Collapse a dtype name to the class the driver's hash distinguishes."""
    d = dtype_str.lower()
    if any(t in d for t in ("float", "double", "decimal")):
        return "float"
    if any(t in d for t in ("int", "long", "short", "byte")):
        return "int"
    if "bool" in d:
        return "bool"
    return "other"


def spark_dtype_class(spark_type: str) -> str:
    d = spark_type.lower()
    # Spark DECIMAL → pandas object(Decimal) → normalized via float lane,
    # matching DuckDB DECIMAL → float64; classify both as float
    if any(t in d for t in ("float", "double", "decimal")):
        return "float"
    if any(t in d for t in ("bigint", "int", "long", "smallint", "tinyint")):
        return "int"
    if "bool" in d:
        return "bool"
    return "other"


def dtype_pairing_errors(sdf_spark, odf) -> list:
    """int↔float pairings between Spark schema and oracle pandas dtypes.

    A DuckDB HUGEINT (or NULL-promoted int) column comes back float64;
    if Spark emits bigint for the same column the driver hashes `70.0`
    vs `70` and the row goes red even though values match — the r4/r5
    `embedding_rp_reduce`/`label_agreement_kappa` failure mode. A
    NULL-bearing numeric column must be double/DECIMAL on the Spark
    side too (the only pattern with green driver precedent), so every
    int↔float pairing is flagged regardless of cause."""
    errs = []
    sparktypes = dict(sdf_spark.dtypes)
    for col in odf.columns:
        if col not in sparktypes:
            continue
        oc = dtype_class(str(odf[col].dtype))
        sc = spark_dtype_class(sparktypes[col])
        if {oc, sc} == {"int", "float"}:
            errs.append(f"{col}: oracle {odf[col].dtype} vs spark {sparktypes[col]}")
    return errs


def _parse_kv_flag(args: list, name: str, default: str) -> str:
    """Read --name V or --name=V from args, removing consumed tokens."""
    val = default
    out = []
    skip = False
    for i, a in enumerate(args):
        if skip:
            skip = False
            continue
        if a == name and i + 1 < len(args):
            val = args[i + 1]
            skip = True
        elif a.startswith(name + "="):
            val = a.split("=", 1)[1]
        else:
            out.append(a)
    args[:] = out
    return val


def run_batched(batch: int, ansi: bool, duckdb_mem: str, sf_dir: str,
                names: list) -> int:
    """Fresh-process batch driver: chunk `names` into groups of `batch`
    and run each through a child checker process (fresh JVM + DuckDB).
    Aggregates the children's totals; a child that dies without a totals
    line counts all its queries as failures."""
    import re as _re
    import subprocess

    tot_pass = tot_weak = tot_fail = 0
    chunks = [names[i : i + batch] for i in range(0, len(names), batch)]
    for ci, chunk in enumerate(chunks):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--duckdb-mem", duckdb_mem]
        if ansi:
            cmd.append("--ansi")
        cmd.append(sf_dir)
        cmd.extend(chunk)
        print(f"== batch {ci + 1}/{len(chunks)}: {len(chunk)} queries "
              f"(fresh process) ==", flush=True)
        proc = subprocess.run(cmd, capture_output=True, text=True)
        totals = None
        for line in proc.stdout.splitlines():
            if line.startswith(("pass ", "FAIL ", "weak ", "==")):
                print(line, flush=True)
            m = _re.match(r"(\d+) pass, (\d+) weak, (\d+) fail", line)
            if m:
                totals = tuple(int(g) for g in m.groups())
        if totals is None:
            print(f"BATCH CRASH (rc={proc.returncode}): counting "
                  f"{len(chunk)} queries as failures; stderr tail:")
            print("\n".join(proc.stderr.splitlines()[-5:]))
            tot_fail += len(chunk)
        else:
            tot_pass += totals[0]
            tot_weak += totals[1]
            tot_fail += totals[2]
    print(f"\n{tot_pass} pass, {tot_weak} weak, {tot_fail} fail "
          f"(batched x{len(chunks)} fresh processes)")
    return 1 if tot_fail else 0


def main() -> int:
    raw = sys.argv[1:]
    batch = int(_parse_kv_flag(raw, "--batch", "0"))
    duckdb_mem = _parse_kv_flag(raw, "--duckdb-mem", "24GB")
    flags = {a for a in raw if a.startswith("--")}
    argv = [a for a in raw if not a.startswith("--")]
    ansi = "--ansi" in flags
    outside_window = "--outside-window" in flags
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    if batch:
        import __spark_entry__ as entrymod

        names = list(entrymod.queries())
        if outside_window:
            names = names[50:]
        if only:
            names = [n for n in names if n in only]
        return run_batched(batch, ansi, duckdb_mem, sf_dir, names)

    import __spark_entry__ as entrymod
    from sap_sql_engine_spark.session import get_spark

    spark = get_spark(
        "correctness-check-ansi" if ansi else "correctness-check",
        extra_conf={"spark.sql.ansi.enabled": "true"} if ansi else None,
    )
    if ansi:
        # getOrCreate() reuses an existing session's conf; force the flag
        spark.conf.set("spark.sql.ansi.enabled", "true")
        print("== ANSI-ON leg (driver environment) ==")
    con = duckdb.connect()
    # ceiling so one oracle can't balloon the checker process (r14
    # verdict item #2 — the r13 sf0.1 sweep's late-run allocator OOMs);
    # DuckDB spills to temp past the limit instead of aborting
    con.execute(f"SET memory_limit='{duckdb_mem}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from sap_sql_engine_spark import cachereg

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if outside_window:
        # The driver's gate records only the FIRST 50 registered queries
        # each round; everything after slot 50 holds an older green row
        # that nothing re-verifies. This leg re-runs exactly that
        # outside-the-window remainder so a regression in an old query
        # surfaces locally the same round it is introduced.
        outside = list(qs)[50:]
        print(f"== outside-window sweep: {len(outside)} queries "
              f"(window holds the first 50 of {len(qs)}) ==")
        if only:
            # explicit names given alongside the flag: intersect, don't
            # silently discard the user's selection
            only &= set(outside)
            print(f"== intersected with explicit names: {sorted(only)} ==")
        else:
            only = set(outside)
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf_spark = fn(spark, sf_dir)
            sdf = sdf_spark.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        finally:
            cachereg.release()  # builder-owned caches; consumed above
        if name not in oracles:
            print(f"weak  {name}: rows={len(sdf)} (no oracle, rows-only check)")
            n_weak += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        derrs = dtype_pairing_errors(sdf_spark, odf)
        if derrs:
            print(f"FAIL  {name}: dtype pairing (driver hash hazard): {derrs}")
            n_fail += 1
            continue
        scols, srows = normalize_df(sdf)
        ocols, orows = normalize_df(odf)
        dt = time.time() - t0
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} != {ocols}")
            n_fail += 1
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            n_fail += 1
        elif srows != orows:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL  {name}: values differ, first diffs: {diff}")
            n_fail += 1
        else:
            print(f"pass  {name}: {len(srows)} rows [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
