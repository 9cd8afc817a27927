"""Seeded SAP-shaped synthetic data — the rebuild's answer to the
reference's ``build_sap_test_db.py``/``expand_sap_test_db.py`` generators
(SURVEY §2.1 S4, §5 item 3), generated as Spark DataFrames instead of
SQLite rows.

Conventions (FIXTURES.md, verified against the reference):
- seeded RNG (the reference uses ``random.Random(42)``),
- zero-padded NUMC keys (vendors 0001000001+, customers 0002000001+, ...),
- ISO dates relative to *runtime* today so aging/"now" templates bucket
  correctly whenever they run,
- SHKZG 'S'/'H' with always-positive amounts on FI line items,
- open items: AUGDT NULL (DateType can't carry the reference's '' sentinel;
  the dialect layer normalizes both spellings),
- LOEKZ '' live / 'X' deleted (~30% of PM operations cancelled),
- balanced journal documents (per BKPF doc: sum of S == sum of H),
- complete O2C chains (VBAK -> LIKP -> VBRK -> BSID with VBFA links).

Every value that a validated template filters or joins on is generated
coherently; remaining model columns default to NULL. Used by
``tests/test_templates_exec.py`` to *execute* the whole valid-template
surface, mirroring the reference's 32/34 end-to-end suite.
"""

from __future__ import annotations

import datetime
import random
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .registry import SemanticModel

SEED = 42
N_VENDORS = 8
N_CUSTOMERS = 8
N_ACCOUNTS = 6
N_ORDERS = 12  # O2C chains
N_POS = 6
N_EMPLOYEES = 10
N_PM_ORDERS = 6


def _pad(prefix: int, i: int, width: int = 10) -> str:
    return str(prefix * 10**6 + i).zfill(width)


def _conv(v, dt: T.DataType):
    if v is None:
        return None
    if isinstance(dt, T.DecimalType):
        return Decimal(str(round(float(v), dt.scale)))
    if isinstance(dt, T.DateType):
        return v if isinstance(v, datetime.date) else datetime.date.fromisoformat(v)
    if isinstance(dt, T.StringType):
        return str(v)
    return v


def _df(spark: SparkSession, model: SemanticModel, table: str, rows: list[dict]) -> DataFrame:
    # all-nullable variant: SAP's composite PKs include clearing fields
    # (AUGDT/AUGBL in BSIK) that are empty on open items — the reference DB
    # stores '' there; with DateType the honest spelling is NULL
    st = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in model.schema_of(table).fields]
    )
    known = {f.name for f in st.fields}
    for r in rows:
        extra = set(r) - known
        if extra:
            raise KeyError(f"{table}: generated unknown columns {sorted(extra)}")
    data = [
        tuple(_conv(r.get(f.name), f.dataType) for f in st.fields) for r in rows
    ]
    return spark.createDataFrame(data, st)


def generate_sap_fixtures(
    spark: SparkSession,
    model: SemanticModel,
    seed: int = SEED,
    register: bool = True,
) -> dict[str, DataFrame]:
    rng = random.Random(seed)
    today = datetime.date.today()
    year = str(today.year)
    month = str(today.month).zfill(2)

    def days_ago(n: int) -> datetime.date:
        return today - datetime.timedelta(days=n)

    t: dict[str, list[dict]] = {}

    # -- vendors + AP line items (open BSIK / cleared BSAK) -----------------
    vendor_names = [
        "ACME Industrial Supply", "Globex Manufacturing", "Initech Components",
        "Umbrella Logistics", "Stark Fabrication", "Wayne Metalworks",
        "Tyrell Plastics", "Soylent Chemical",
    ]
    t["LFA1"] = [
        {"LIFNR": _pad(1, i + 1), "NAME1": vendor_names[i], "LAND1": "US",
         "ORT01": "Springfield", "KTOKK": "KRED"}
        for i in range(N_VENDORS)
    ]
    t["BSIK"], t["BSAK"] = [], []
    doc_no = 5100000000
    for i in range(N_VENDORS):
        for j in range(3):
            doc_no += 1
            amount = round(rng.uniform(500, 20000), 2)
            row = {
                "BUKRS": "1000", "LIFNR": _pad(1, i + 1), "BELNR": str(doc_no),
                "GJAHR": year, "BUZEI": "001", "BUDAT": days_ago(rng.randint(5, 200)),
                "BLDAT": days_ago(rng.randint(5, 200)),
                "ZFBDT": days_ago(rng.choice([-10, 15, 45, 75, 120])),
                "SHKZG": "S" if j < 2 else "H", "DMBTR": amount,
                "WAERS": "USD", "SGTXT": f"Invoice {doc_no}", "AUGDT": None,
            }
            if j == 2:  # cleared -> BSAK with AUGDT set
                row["AUGDT"] = days_ago(rng.randint(1, 60))
                t["BSAK"].append(row)
            else:
                t["BSIK"].append(row)

    # -- org master: company code + plants ---------------------------------
    t["T001"] = [
        {"BUKRS": "1000", "BUTXT": "SAP Demo Company", "KTOPL": "INT",
         "LAND1": "US", "WAERS": "USD"}
    ]
    t["T001W"] = [
        {"WERKS": "1000", "NAME1": "Springfield Plant", "BWKEY": "1000",
         "BUKRS": "1000"},
        {"WERKS": "2000", "NAME1": "Shelbyville Plant", "BWKEY": "2000",
         "BUKRS": "1000"},
    ]

    # -- customers + AR (BSID aging spread; BELNR ties to VBRK billing) ----
    t["KNA1"] = [
        {"KUNNR": _pad(2, i + 1), "NAME1": f"Customer {chr(65 + i)} Corp",
         "LAND1": "US", "ORT01": "Shelbyville", "KTOKD": "DEBI"}
        for i in range(N_CUSTOMERS)
    ]

    # -- O2C chains: VBAK -> LIKP -> VBRK -> BSID with VBFA links ----------
    # open AR stays in BSID (AUGDT NULL), cleared moves to BSAD — the
    # reference's open/cleared table split (expand_sap_test_db.py:162-164)
    t["VBAK"], t["LIKP"], t["VBRK"], t["VBFA"], t["BSID"], t["BSAD"] = (
        [], [], [], [], [], []
    )
    t["VBAP"], t["VBRP"] = [], []
    materials = [_pad(5, j + 1, 18) for j in range(3)]
    for i in range(N_ORDERS):
        so = _pad(3, i + 1)
        kunnr = _pad(2, (i % N_CUSTOMERS) + 1)
        erdat = (
            datetime.date(today.year - 1, 1 + (i % 3), 5 + i)
            if i % 4 == 0
            else days_ago(20 + 10 * i)
        )
        netwr = round(rng.uniform(5000, 80000), 2)
        t["VBAK"].append(
            {"VBELN": so, "ERDAT": erdat, "AUART": "TA", "VBTYP": "C",
             "KUNNR": kunnr, "NETWR": netwr, "WAERK": "USD", "LOEKZ": ""}
        )
        # two items per order splitting the net value (VA03 display)
        for j, posnr in enumerate(("000010", "000020")):
            t["VBAP"].append(
                {"VBELN": so, "POSNR": posnr, "MATNR": materials[(i + j) % 3],
                 "ARKTX": f"Item {posnr} of {so}", "KWMENG": 5 * (j + 1),
                 "VRKME": "EA", "NETWR": round(netwr / 2, 2), "WAERK": "USD",
                 "WERKS": "1000" if j == 0 else "2000", "LOEKZ": ""}
            )
        if i % 4 == 3:
            continue  # open order: no delivery (pipeline stage 1)
        dl = _pad(8, i + 1)
        t["LIKP"].append(
            {"VBELN": dl, "ERDAT": erdat + datetime.timedelta(days=3),
             "WADAT": erdat + datetime.timedelta(days=5), "KUNNR": kunnr}
        )
        t["VBFA"].append({"VBELV": so, "VBELN": dl, "VBTYP_N": "J"})
        if i % 4 == 2:
            continue  # pending delivery: not billed (stage 2)
        bill = _pad(9, i + 1)
        t["VBRK"].append(
            {"VBELN": bill, "FKDAT": erdat + datetime.timedelta(days=8),
             "KUNAG": kunnr, "NETWR": netwr, "WAERK": "USD"}
        )
        t["VBFA"].append({"VBELV": dl, "VBELN": bill, "VBTYP_N": "M"})
        # billing items mirror the order items (VF03 display)
        for j, posnr in enumerate(("000010", "000020")):
            t["VBRP"].append(
                {"VBELN": bill, "POSNR": posnr, "FKIMG": 5 * (j + 1),
                 "VRKME": "EA", "NETWR": round(netwr / 2, 2),
                 "MATNR": materials[(i + j) % 3],
                 "ARKTX": f"Item {posnr} of {so}", "WERKS": "1000",
                 "AUBEL": so, "AUPOS": posnr}
            )
        # AR invoice for billed chains; half stay open (BSID), half
        # cleared (BSAD).  ZFBDT cycles a fixed spread so every aging
        # bucket is deterministically populated.
        ar_row = {
            "BUKRS": "1000", "KUNNR": kunnr, "BELNR": bill, "GJAHR": year,
            "BUZEI": "001", "BUDAT": days_ago(min(10 + 10 * i, 300)),
            "BLDAT": days_ago(min(10 + 10 * i, 300)),
            "ZFBDT": days_ago([-5, 10, 40, 70, 100, 130][i % 6]),
            "SHKZG": "S", "DMBTR": netwr, "WAERS": "USD", "AUGDT": None,
        }
        if i % 2 == 0:
            t["BSID"].append(ar_row)
        else:
            t["BSAD"].append({**ar_row, "AUGDT": days_ago(2), "AUGBL": bill})

    # -- GL: accounts + balances + journal docs ----------------------------
    saknr = [str(400000 + 100 * i).zfill(10) for i in range(N_ACCOUNTS)]
    t["SKA1"] = [
        {"SAKNR": s, "KTOPL": "INT", "XBILK": "X" if i < 2 else "",
         "KTOKS": "PL"}
        for i, s in enumerate(saknr)
    ]
    t["SKB1"] = [
        {"SAKNR": s, "BUKRS": "1000", "WAERS": "USD", "MITKZ": ""}
        for s in saknr
    ]
    t["SKAT"] = [
        {"KTOPL": "INT", "SPRAS": "E", "SAKNR": s,
         "TXT20": f"Acct {s[-6:]}", "TXT50": f"General ledger account {s[-6:]}"}
        for s in saknr
    ]
    t["GLT0"] = [
        {"RLDNR": "00", "BUKRS": "1000", "RACCT": s, "GJAHR": year,
         "DRCRK": drcrk, "HSLVT": round(rng.uniform(-5000, 5000), 2),
         **{f"HSL{str(p).zfill(2)}": round(rng.uniform(-2000, 2000), 2)
            for p in range(1, 17)}}
        for s in saknr
        for drcrk in ("S", "H")
    ]
    t["BKPF"], t["BSEG"] = [], []
    for i in range(6):
        doc = str(100000000 + i)
        budat = days_ago(3 * i) if i > 0 else today  # doc 0 in current period
        amount = round(rng.uniform(1000, 9000), 2)
        t["BKPF"].append(
            {"BUKRS": "1000", "BELNR": doc, "GJAHR": year, "BLART": "SA",
             "BUDAT": budat, "BLDAT": budat, "MONAT": month if i == 0 else
             str(budat.month).zfill(2), "WAERS": "USD",
             "BKTXT": f"Journal {doc}"}
        )
        # balanced: one S line, one H line, same amount
        for buzei, shkzg, hkont in (("001", "S", saknr[0]), ("002", "H", saknr[1])):
            t["BSEG"].append(
                {"BUKRS": "1000", "BELNR": doc, "GJAHR": year, "BUZEI": buzei,
                 "BSCHL": "40" if shkzg == "S" else "50", "SHKZG": shkzg,
                 "DMBTR": amount, "HKONT": hkont, "SGTXT": f"Line {buzei}",
                 "KOSTL": str(1000 + i).zfill(10)}
            )
            # GL line-item twin: open in BSIS, cleared docs (last 2) in BSAS
            gl_row = {
                "HKONT": hkont, "BUKRS": "1000", "BELNR": doc, "GJAHR": year,
                "BUZEI": buzei, "BUDAT": budat, "BLDAT": budat, "BLART": "SA",
                "BSCHL": "40" if shkzg == "S" else "50", "DMBTR": amount,
                "SHKZG": shkzg, "WAERS": "USD", "SGTXT": f"Line {buzei}",
                "MONAT": str(budat.month).zfill(2), "AUGDT": None,
            }
            if i >= 4:
                t.setdefault("BSAS", []).append(
                    {**gl_row, "AUGDT": days_ago(1), "AUGBL": doc}
                )
            else:
                t.setdefault("BSIS", []).append(gl_row)

    # -- CO: cost-center actual vs plan + CO documents ---------------------
    t["COSP"] = []
    for cc in ("0000001000", "0000002000"):
        for wrttp in ("04", "01"):  # actual / plan
            t["COSP"].append(
                {"OBJNR": f"KS1000{cc}", "GJAHR": "2025", "WRTTP": wrttp,
                 "KSTAR": "0000400000", "VERSN": "000",
                 **{f"WKG{str(p).zfill(3)}": round(rng.uniform(100, 900), 2)
                    for p in range(1, 13)}}
            )
    t["COBK"] = [
        {"KOKRS": "1000", "BELNR": str(200000000 + i), "GJAHR": year,
         "PERIO": month, "BUDAT": days_ago(i), "BLTXT": f"CO doc {i}"}
        for i in range(3)
    ]

    # -- MM: purchase orders over threshold --------------------------------
    t["EKKO"], t["EKPO"], t["EKBE"] = [], [], []
    for i in range(N_POS):
        po = _pad(4, i + 1)
        t["EKKO"].append(
            {"EBELN": po, "LIFNR": _pad(1, (i % N_VENDORS) + 1),
             "BEDAT": days_ago(30 + 5 * i), "WAERS": "USD", "LOEKZ": "",
             "BSART": "NB", "EKORG": "1000"}
        )
        # first half of POs exceed the 50k HAVING threshold
        line_value = 30000 if i < N_POS // 2 else 4000
        for j in range(3):
            ebelp = str((j + 1) * 10).zfill(5)
            t["EKPO"].append(
                {"EBELN": po, "EBELP": ebelp, "MATNR": materials[j],
                 "NETWR": line_value, "MENGE": 10, "WERKS": "1000",
                 "LOEKZ": ""}
            )
            if j < 2:  # first two lines partially received (ME23N/ME2M)
                t["EKBE"].append(
                    {"EBELN": po, "EBELP": ebelp, "VGABE": "1", "GJAHR": year,
                     "BELNR": str(5000000000 + i * 10 + j), "BUZEI": "001",
                     "BEWTP": "E", "BWART": "101",
                     "BUDAT": days_ago(20 + 5 * i), "MENGE": 6,
                     "DMBTR": round(line_value * 0.6, 2), "WAERS": "USD",
                     "SHKZG": "S", "MATNR": materials[j], "WERKS": "1000"}
                )
    t["MAKT"] = [
        {"MATNR": mat, "SPRAS": "E", "MAKTX": f"Widget model {j + 1}"}
        for j, mat in enumerate(materials)
    ]

    # -- HR: employees + org texts -----------------------------------------
    first = ["Ava", "Ben", "Cora", "Dev", "Eli", "Fay", "Gus", "Hana", "Ivo", "Jun"]
    last = ["Ng", "Ortiz", "Patel", "Quinn", "Reyes", "Sato", "Tran", "Ueda", "Vega", "Wong"]
    t["PA0001"] = [
        {"PERNR": str(100000 + i).zfill(8), "ENDDA": "9999-12-31",
         "BEGDA": "2020-01-01", "BUKRS": "1000", "WERKS": "1000",
         "KOSTL": str(1000 + i % 3).zfill(10), "ORGEH": str(i % 3 + 1).zfill(8),
         "STELL": str(i % 4 + 10).zfill(8), "PLANS": str(i % 4 + 20).zfill(8),
         "PERSG": "1", "PERSK": "U1"}
        for i in range(N_EMPLOYEES)
    ]
    t["PA0002"] = [
        {"PERNR": str(100000 + i).zfill(8), "ENDDA": "9999-12-31",
         "BEGDA": "2020-01-01", "VORNA": first[i], "NACHN": last[i],
         "GBDAT": "1990-01-01"}
        for i in range(N_EMPLOYEES)
    ]
    t["HRP1000"] = (
        [{"PLVAR": "01", "OTYPE": "O", "OBJID": str(i + 1).zfill(8), "ISTAT": "1",
          "BEGDA": "2020-01-01", "ENDDA": "9999-12-31", "LANGU": "E",
          "STEXT": f"Org Unit {i + 1}"} for i in range(3)]
        + [{"PLVAR": "01", "OTYPE": "S", "OBJID": str(i + 10).zfill(8), "ISTAT": "1",
            "BEGDA": "2020-01-01", "ENDDA": "9999-12-31", "LANGU": "E",
            "STEXT": f"Position {i}"} for i in range(4)]
        + [{"PLVAR": "01", "OTYPE": "C", "OBJID": str(i + 20).zfill(8), "ISTAT": "1",
            "BEGDA": "2020-01-01", "ENDDA": "9999-12-31", "LANGU": "E",
            "STEXT": f"Job {i}"} for i in range(4)]
    )

    # -- PM: maintenance order chain ---------------------------------------
    t["AUFK"], t["AFIH"], t["AFKO"], t["AFVC"], t["AFRU"], t["EQKT"] = (
        [], [], [], [], [], []
    )
    for i in range(N_PM_ORDERS):
        aufnr = _pad(6, i + 1, 12)
        equnr = str(700000 + i % 3).zfill(18)
        aufpl = str(900000 + i).zfill(10)
        t["AUFK"].append(
            {"AUFNR": aufnr, "AUART": "PM01", "AUTYP": "30", "LOEKZ": "",
             "KTEXT": f"Repair pump {i}", "ERDAT": days_ago(10 * i + 5),
             "BUKRS": "1000", "KOKRS": "1000", "KOSTV": "0000001000"}
        )
        t["AFIH"].append(
            {"AUFNR": aufnr, "EQUNR": equnr, "ILART": "001", "PRIOK": str(i % 3 + 1),
             "TPLNR": f"PLANT-A-{i % 2}", "GSTRP": days_ago(10 * i + 4),
             "GLTRP": days_ago(10 * i - 3)}
        )
        t["AFKO"].append(
            {"AUFNR": aufnr, "AUFPL": aufpl, "GSTRP": days_ago(10 * i + 4),
             "GLTRP": days_ago(10 * i - 3)}
        )
        for j in range(3):
            cancelled = "X" if (i * 3 + j) % 3 == 0 else ""  # ~30% cancelled
            t["AFVC"].append(
                {"AUFPL": aufpl, "APLZL": str(j + 1).zfill(8),
                 "VORNR": str((j + 1) * 10).zfill(4),
                 "LTXA1": f"Operation {j} on order {i}", "ARBPL": "MECH01",
                 "LOEKZ": cancelled}
            )
            t["AFRU"].append(
                {"AUFNR": aufnr, "RUECK": str(800000 + i * 10 + j).zfill(10),
                 "VORNR": str((j + 1) * 10).zfill(4), "BUDAT": days_ago(10 * i),
                 "ISMNW": round(rng.uniform(0.5, 8.0), 1),
                 "PERNR": str(100000 + (i + j) % N_EMPLOYEES).zfill(8),
                 "STOKZ": ""}
            )
    t["EQKT"] = [
        {"EQUNR": str(700000 + i).zfill(18), "SPRAS": "E",
         "EQKTX": f"Centrifugal pump {i}"}
        for i in range(3)
    ]

    out: dict[str, DataFrame] = {}
    for name, rows in t.items():
        df = _df(spark, model, name, rows)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
