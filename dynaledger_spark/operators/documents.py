"""JSON document pipeline: assembly (D1/D2), flatten views (J6), merge (J7).

Reference: ext_zip_convert_into_json_store.py:35-155 builds one nested JSON
per filing with an O(filings × rows) driver loop — per num-row linear
searches of the tag and pre frames ("first match wins"), per-filing
re-scans of num. That loop is the single biggest algorithmic win of the
rewrite (SURVEY §4): here it becomes hash joins + a when()-routed
collect_list, one shuffle over num.

Faithful semantics:
  * label  = first tag-file row matching `tag` → its `doc`, else 'Unknown'
  * info/stmt = first pre row matching (adsh, tag) → plabel/stmt,
    else 'Unknown'/'UNKNOWN'   (first = file order, via the ingest _row_id)
  * value NaN → 0
  * filings with missing/invalid `period` are skipped entirely
  * routing: stmt 'BS'→data.bs, 'CF'→data.cf, 'IC' or 'IS'→data.ic,
    anything else dropped
  * scalars: quarter=fp, country=coalesce(countryma,'UNKNOWN'),
    year=coalesce(fy,0), city=coalesce(cityma,'UNKNOWN'),
    symbol=ticker[cik] else 'UNKNOWN', startDate=endDate=period
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from dynaledger_spark.sources.tsv import ROW_ID


def _first_by(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keep the first file-order row per key ("first match wins")."""
    order = F.col(ROW_ID).asc() if ROW_ID in df.columns else F.lit(1)
    w = W.partitionBy(*keys).orderBy(order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def assemble_documents(
    sub: DataFrame,
    num: DataFrame,
    tag: DataFrame,
    pre: DataFrame,
    ticker: DataFrame,
) -> DataFrame:
    """One nested document row per filing (schema: schemas.DOC_SCHEMA).

    Plan shape: num ⋈ dedup(tag) [broadcastable taxonomy] ⋈ dedup(pre)
    ⋈ sub ⋈ broadcast(ticker) → groupBy(adsh) with three conditional
    sorted collect_lists → struct. One wide shuffle on adsh; everything
    else is map-side.
    """
    # Filings with a parseable period (reference skips the rest).
    sub_ok = (
        sub.withColumn(
            "period_date",
            F.try_to_date(F.col("period").cast("bigint").cast("string"), "yyyyMMdd"),
        )
        .filter(F.col("period_date").isNotNull())
    )

    tag_first = _first_by(tag.select("tag", "doc", *([ROW_ID] if ROW_ID in tag.columns else [])), ["tag"])
    pre_first = _first_by(
        pre.select("adsh", "tag", "plabel", "stmt", *([ROW_ID] if ROW_ID in pre.columns else [])),
        ["adsh", "tag"],
    )

    enriched = (
        num.join(tag_first.select("tag", "doc"), "tag", "left")
        .join(pre_first.select("adsh", "tag", "plabel", "stmt"), ["adsh", "tag"], "left")
        .select(
            "adsh",
            F.struct(
                (F.col(ROW_ID) if ROW_ID in num.columns else F.lit(0)).alias("ord"),
                F.coalesce(F.col("doc"), F.lit("Unknown")).alias("label"),
                F.col("tag").alias("concept"),
                F.coalesce(F.col("plabel"), F.lit("Unknown")).alias("info"),
                F.col("uom").alias("unit"),
                F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
            ).alias("element"),
            F.coalesce(F.col("stmt"), F.lit("UNKNOWN")).alias("stmt_type"),
        )
    )

    def routed(code_test):
        # collect_list drops nulls → acts as a filtered collect; array_sort
        # on (ord, ...) restores num file order, then ord is projected out.
        collected = F.array_sort(
            F.collect_list(F.when(code_test, F.col("element")))
        )
        return F.transform(
            collected,
            lambda x: F.struct(
                x["label"].alias("label"),
                x["concept"].alias("concept"),
                x["info"].alias("info"),
                x["unit"].alias("unit"),
                x["value"].alias("value"),
            ),
        )

    stmt = F.col("stmt_type")
    docs_arrays = enriched.groupBy("adsh").agg(
        routed(stmt == "BS").alias("bs"),
        routed(stmt == "CF").alias("cf"),
        routed(stmt.isin("IC", "IS")).alias("ic"),
    )

    ticker_dim = ticker.select("cik", "symbol")
    return (
        sub_ok.select(
            "adsh", "cik", "name", "fp", "fy", "countryma", "cityma", "period_date"
        )
        .join(docs_arrays, "adsh", "left")
        .join(F.broadcast(ticker_dim), "cik", "left")
        .select(
            F.col("adsh"),
            F.col("fp").alias("quarter"),
            F.coalesce(F.col("countryma"), F.lit("UNKNOWN")).alias("country"),
            F.coalesce(F.col("fy").cast("int"), F.lit(0)).alias("year"),
            F.col("name"),
            F.col("period_date").alias("startDate"),
            F.col("period_date").alias("endDate"),
            F.coalesce(F.col("symbol"), F.lit("UNKNOWN")).alias("symbol"),
            F.coalesce(F.col("cityma"), F.lit("UNKNOWN")).alias("city"),
            F.struct(
                F.coalesce(F.col("bs"), F.array()).alias("bs"),
                F.coalesce(F.col("cf"), F.array()).alias("cf"),
                F.coalesce(F.col("ic"), F.array()).alias("ic"),
            ).alias("data"),
        )
    )


def documents_table(docs: DataFrame) -> DataFrame:
    """The JSON table (load_json_data_snowflake.py:126-161): scalar columns
    + the document as a VARIANT analog. The reference's post-load
    `UPDATE … SET x = raw_json:"x"::TYPE` is just projections here —
    no mutable storage needed (SURVEY §2.2 P12).
    """
    return docs.select(
        F.col("symbol"),
        F.col("name").alias("company_name"),
        F.col("startDate").alias("start_date"),
        F.col("endDate").alias("end_date"),
        F.struct(
            "quarter", "country", "year", "name", "startDate", "endDate",
            "symbol", "city", "data",
        ).alias("raw_json"),
    )


def merge_dedup_by_symbol(table: DataFrame) -> DataFrame:
    """MERGE INTO … ON target.symbol = source.symbol
    (load_json_data_snowflake.py:165-187) without Delta: keep one row per
    symbol — latest end_date wins, adsh-order tiebreak via company_name —
    then overwrite. Same post-state as the reference's self-merge.
    """
    w = W.partitionBy("symbol").orderBy(
        F.col("end_date").desc(), F.col("company_name").asc()
    )
    return (
        table.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def flatten_statement_view(table: DataFrame, section: str) -> DataFrame:
    """LATERAL FLATTEN view (load_json_data_snowflake.py:217-257, J6):
    one row per statement line item, scalars repeated, value cast FLOAT.
    """
    return table.select(
        "symbol",
        "company_name",
        F.explode(F.col(f"raw_json.data.{section}")).alias("item"),
    ).select(
        "symbol",
        "company_name",
        F.col("item.label").alias("label"),
        F.col("item.concept").alias("concept"),
        F.col("item.info").alias("info"),
        F.col("item.unit").alias("unit"),
        F.col("item.value").cast("double").alias("value"),
    )


def register_flatten_views(
    spark, table: DataFrame, year: int, quarter: str
) -> dict[str, DataFrame]:
    """CREATE OR REPLACE VIEW ×3 (S11) — bs/ic/cf flatten views."""
    out = {}
    names = {"bs": "balance_sheet", "ic": "income_statement", "cf": "cash_flow"}
    for section, stem in names.items():
        view = flatten_statement_view(table, section)
        view.createOrReplaceTempView(f"view_{stem}_{year}_{quarter}")
        out[stem] = view
    return out
