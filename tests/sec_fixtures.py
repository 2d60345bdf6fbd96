"""Synthetic SEC-shaped fixtures (FIXTURES.md §A) with deliberate dirt:
orphan FKs, duplicate keys, bad dates, NaN values, missing ticker ciks —
the violations the reference's dbt tests exist to catch."""

from __future__ import annotations

import os

import pandas as pd

from dynaledger_spark.schemas import SEC_SCHEMAS

Q = "2023Q1"


def _frame(table: str, rows: list[dict]) -> pd.DataFrame:
    cols = [f.name for f in SEC_SCHEMAS[table].fields if f.name != "source_file"]
    df = pd.DataFrame(rows)
    for c in cols:
        if c not in df.columns:
            df[c] = None
    return df[cols]


def sub_rows() -> list[dict]:
    base = dict(
        cik=100, name="ACME CORP", sic=3711, countryba="US", countryinc="US",
        wksi=0, fye=1231, form="10-K", period=20230331, fy=2023, fp="Q1",
        filed=20230410, accepted="2023-04-10 08:24:00.0", prevrpt=0, detail=1,
        nciks=1, countryma="US", cityma="BOSTON",
    )
    return [
        {**base, "adsh": "0000000001-23-000001"},
        {**base, "adsh": "0000000002-23-000002", "cik": 200, "name": "BETA INC",
         "cityma": None, "fy": None},
        # dirty: sic out of range, lowercase countryba, fp junk
        {**base, "adsh": "0000000003-23-000003", "cik": 300, "name": "GAMMA LLC",
         "sic": 99, "countryba": "us", "fp": "ZZ", "countryma": None},
        # invalid period → document pipeline must skip this filing
        {**base, "adsh": "0000000004-23-000004", "cik": 400, "name": "DELTA CO",
         "period": None},
        {**base, "adsh": "0000000005-23-000005", "cik": 500, "name": "EPSILON SA",
         "period": 20231399},  # unparseable yyyymmdd
    ]


def tag_rows() -> list[dict]:
    return [
        dict(tag="Assets", version="us-gaap/2022", custom=0, abstract=0,
             datatype="monetary", iord="I", crdr="D", tlabel="Assets",
             doc="Total assets as of the balance sheet date."),
        dict(tag="NetIncomeLoss", version="us-gaap/2022", custom=0, abstract=0,
             datatype="monetary", iord="D", crdr="C", tlabel="Net Income (Loss)",
             doc=None),
        # duplicate tag rows with different doc → first-match semantics
        dict(tag="DupTag", version="us-gaap/2022", custom=0, abstract=0,
             datatype="monetary", iord="I", crdr="D", tlabel="Dup v1",
             doc="FIRST DOC"),
        dict(tag="DupTag", version="us-gaap/2023", custom=0, abstract=0,
             datatype="monetary", iord="I", crdr="D", tlabel="Dup v2",
             doc="SECOND DOC"),
        dict(tag="CashFlowTag", version="us-gaap/2022", custom=0, abstract=0,
             datatype="monetary", iord="D", crdr="D", tlabel="CF tag",
             doc="cash flow doc"),
        # dirty: bad datatype/iord
        dict(tag="WeirdTag", version="custom/1", custom=1, abstract=0,
             datatype="bogus", iord="X", crdr="C", tlabel="Weird", doc=None),
    ]


def num_rows() -> list[dict]:
    a1, a2 = "0000000001-23-000001", "0000000002-23-000002"
    return [
        dict(adsh=a1, tag="Assets", version="us-gaap/2022", ddate=20230331,
             qtrs=0, uom="USD", value=1000.5),
        dict(adsh=a1, tag="Assets", version="us-gaap/2022", ddate=20230331,
             qtrs=4, uom="USD", value=250.25),
        dict(adsh=a1, tag="NetIncomeLoss", version="us-gaap/2022", ddate=20230331,
             qtrs=4, uom="USD", value=-42.5),
        dict(adsh=a1, tag="DupTag", version="us-gaap/2022", ddate=20230331,
             qtrs=0, uom="USD", value=7.0),
        dict(adsh=a2, tag="Assets", version="us-gaap/2022", ddate=20230331,
             qtrs=0, uom="USD", value=2000.0),
        dict(adsh=a2, tag="CashFlowTag", version="us-gaap/2022", ddate=20230331,
             qtrs=4, uom="USD", value=None),  # NaN → 0 in documents
        # orphan adsh (FK violation) + bad ddate (7 digits)
        dict(adsh="9999999999-99-999999", tag="Assets", version="us-gaap/2022",
             ddate=2023033, qtrs=0, uom="USD", value=1.0),
        # tag/version not in taxonomy (FK violation)
        dict(adsh=a2, tag="GhostTag", version="none/0", ddate=20230331,
             qtrs=0, uom="USD", value=3.0),
    ]


def pre_rows() -> list[dict]:
    a1, a2 = "0000000001-23-000001", "0000000002-23-000002"
    return [
        dict(adsh=a1, report=1, line=1, stmt="BS", inpth=0, rfile="H",
             tag="Assets", version="us-gaap/2022", plabel="Total assets", negating=0),
        dict(adsh=a1, report=2, line=1, stmt="IS", inpth=0, rfile="H",
             tag="NetIncomeLoss", version="us-gaap/2022", plabel="Net income", negating=0),
        # two pre rows for same (adsh, tag) → first-match wins for info/stmt
        dict(adsh=a1, report=3, line=1, stmt="BS", inpth=0, rfile="H",
             tag="DupTag", version="us-gaap/2022", plabel="FIRST PLABEL", negating=0),
        dict(adsh=a1, report=3, line=2, stmt="CF", inpth=0, rfile="H",
             tag="DupTag", version="us-gaap/2023", plabel="SECOND PLABEL", negating=0),
        dict(adsh=a2, report=1, line=1, stmt="BS", inpth=0, rfile="H",
             tag="Assets", version="us-gaap/2022", plabel="Assets, total", negating=0),
        dict(adsh=a2, report=2, line=1, stmt="CF", inpth=0, rfile="X",
             tag="CashFlowTag", version="us-gaap/2022", plabel=None, negating=0),
        # duplicate (adsh, report, line) key — unique test must flag it
        dict(adsh=a2, report=1, line=1, stmt="BS", inpth=0, rfile="H",
             tag="Assets", version="us-gaap/2022", plabel="dup row", negating=0),
        # dirty stmt domain
        dict(adsh=a2, report=9, line=9, stmt="XX", inpth=2, rfile="Z",
             tag="GhostTag", version="none/0", plabel="ghost", negating=0),
    ]


def ticker_rows() -> list[tuple[str, int]]:
    # cik 100 duplicated (first row wins); cik 300/400/500 missing → UNKNOWN
    return [("acme", 100), ("acme2", 100), ("beta", 200), ("zeta", 999)]


def write_fixtures(out_dir: str) -> dict[str, str]:
    """Write the four TSVs + ticker.txt; returns table→path."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    frames = {
        "sec_sub": _frame("sec_sub", sub_rows()),
        "sec_tag": _frame("sec_tag", tag_rows()),
        "sec_num": _frame("sec_num", num_rows()),
        "sec_pre": _frame("sec_pre", pre_rows()),
    }
    names = {"sec_sub": "sub.txt", "sec_tag": "tag.txt", "sec_num": "num.txt", "sec_pre": "pre.txt"}
    for table, frame in frames.items():
        path = os.path.join(out_dir, names[table])
        frame.to_csv(path, sep="\t", index=False)
        paths[table] = path
    tick = os.path.join(out_dir, "ticker.txt")
    pd.DataFrame(ticker_rows()).to_csv(tick, sep="\t", index=False, header=False)
    paths["ticker"] = tick
    return paths
