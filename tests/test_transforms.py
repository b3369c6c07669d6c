"""Structural transforms: flatten, flatten-explode, diff (N/I/D/C)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_etl_cli_spark.operators.diff import (
    DiffFailedError,
    apply_diff_handling,
    diff,
)
from spark_etl_cli_spark.operators.schema_tools import (
    flatten,
    flatten_explode,
    json_encode_complex,
)


@pytest.fixture()
def nested(spark):
    return spark.createDataFrame(
        [
            Row(id=1, info=Row(name="a", geo=Row(lat=1.0, lon=2.0)), tags=["x", "y"]),
            Row(id=2, info=Row(name="b", geo=Row(lat=3.0, lon=4.0)), tags=["z"]),
        ]
    )


def test_flatten_structs_only(nested):
    out = flatten(nested)
    assert set(out.columns) == {"id", "info_name", "info_geo_lat", "info_geo_lon", "tags"}
    row = {r.id: r for r in out.collect()}
    assert row[1].info_geo_lat == 1.0
    assert row[2].info_name == "b"
    # arrays untouched by flatten (reference TransformerParser.scala:34-58)
    assert row[1].tags == ["x", "y"]


def test_flatten_explode(nested):
    out = flatten_explode(nested)
    # structs flattened AND arrays exploded to one row per element
    assert out.count() == 3
    assert set(out.columns) == {"id", "info_name", "info_geo_lat", "info_geo_lon", "tags"}
    tags = sorted(r.tags for r in out.filter(F.col("id") == 1).collect())
    assert tags == ["x", "y"]


def test_flatten_explode_array_of_struct(spark):
    df = spark.createDataFrame(
        [Row(id=1, items=[Row(sku="s1", qty=2), Row(sku="s2", qty=3)])]
    )
    out = flatten_explode(df)
    assert out.count() == 2
    assert {"items_sku", "items_qty"} <= set(out.columns)
    assert sorted(r.items_qty for r in out.collect()) == [2, 3]


def test_json_encode_complex(spark):
    df = spark.createDataFrame([Row(id=1, s=Row(a=1), arr=[1, 2])])
    out = json_encode_complex(df)
    types = dict(out.dtypes)
    assert types["s"] == "string" and types["arr"] == "string"
    r = out.collect()[0]
    assert r.s == '{"a":1}' and r.arr == "[1,2]"


@pytest.fixture()
def diff_pair(spark):
    left = spark.createDataFrame(
        [Row(k=1, v="same"), Row(k=2, v="old"), Row(k=3, v="gone")]
    )
    right = spark.createDataFrame(
        [Row(k=1, v="same"), Row(k=2, v="new"), Row(k=4, v="added")]
    )
    return left, right


def test_diff_nidc(diff_pair):
    left, right = diff_pair
    out = {r.k: r for r in diff(left, right, ["k"]).collect()}
    assert out[1].diff == "N" and out[1].left_v == "same"
    assert out[2].diff == "C" and (out[2].left_v, out[2].right_v) == ("old", "new")
    assert out[3].diff == "D" and out[3].right_v is None
    assert out[4].diff == "I" and out[4].left_v is None


def test_diff_ignore_cols(spark):
    left = spark.createDataFrame([Row(k=1, v="a", noise="x")])
    right = spark.createDataFrame([Row(k=1, v="a", noise="y")])
    assert diff(left, right, ["k"], ignore_cols=["noise"]).collect()[0].diff == "N"
    assert diff(left, right, ["k"]).collect()[0].diff == "C"


def test_diff_null_safe_compare(spark):
    left = spark.createDataFrame([(1, None), (2, "x")], "k int, v string")
    right = spark.createDataFrame([(1, None), (2, None)], "k int, v string")
    out = {r.k: r.diff for r in diff(left, right, ["k"]).collect()}
    assert out == {1: "N", 2: "C"}


def test_diff_handle_filter_and_fail(diff_pair):
    left, right = diff_pair
    d = diff(left, right, ["k"])
    assert apply_diff_handling(d, "filter").count() == 3  # C, D, I
    with pytest.raises(DiffFailedError):
        apply_diff_handling(d, "fail")
    same = diff(left, left, ["k"])
    assert apply_diff_handling(same, "fail").count() == 3  # no raise


def test_diff_requires_id_cols(diff_pair):
    left, right = diff_pair
    with pytest.raises(ValueError):
        diff(left, right, [])
    with pytest.raises(ValueError):
        diff(left, right, ["missing"])


def test_cdc_apply_transform_materializes_snapshot(spark):
    from spark_etl_cli_spark.registry import resolve_transform

    df = spark.createDataFrame(
        [
            # id=1: insert then update -> latest value
            (1, 1, "insert", 10.0),
            (1, 2, "update_postimage", 11.0),
            (1, 2, "update_preimage", 10.0),  # descriptive, ignored
            # id=2: insert then delete -> gone
            (2, 1, "insert", 20.0),
            (2, 3, "delete", 20.0),
            # id=3: plain insert
            (3, 2, "insert", 30.0),
        ],
        "id long, version long, _change_type string, v double",
    )
    df.createOrReplaceTempView("chg")
    _uri, fn = resolve_transform(
        "chg+snap+cdc-apply://?key=id&sequence=version"
    )
    got = {(r["id"], r["v"]) for r in fn(spark, df).collect()}
    assert got == {(1, 11.0), (3, 30.0)}


def test_cdc_apply_transform_requires_key_and_sequence(spark):
    import pytest

    from spark_etl_cli_spark.registry import resolve_transform

    with pytest.raises(ValueError, match="key"):
        resolve_transform("a+b+cdc-apply://?sequence=v")


def test_incremental_dedup_transform_uri_loop(spark, tmp_path):
    """dedup://?mode=incremental as a PIPELINE surface: two id-ordered
    batches through the full URI loop (probe state -> sink survivors ->
    append probe rows to the delta state) produce exactly the full-
    recompute survivor set, and the state accumulates every row."""
    from spark_etl_cli_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
    )
    from spark_etl_cli_spark.pipeline import run_pipeline
    from spark_etl_cli_spark.sources.delta_lite import read_delta_lite

    from tests.conftest import SF_DIR

    state = str(tmp_path / "state")
    corpus = str(tmp_path / "corpus")
    for pred in ("doc_id <= 249", "doc_id > 249"):
        run_pipeline(
            spark,
            sources=[
                f"docs+parquet://{SF_DIR}/documents.parquet?where={pred}"
            ],
            transforms=[
                "docs+dec+dedup://?mode=incremental&tier=minhash"
                f"&state={state}&hash-family=fast",
                "dec+surv+sql://SELECT doc_id, text, source FROM dec "
                "WHERE dup_of IS NULL",
                "dec+sig+sql://SELECT doc_id AS id, signature FROM dec",
            ],
            sinks=[
                f"surv+delta://{corpus}?mode=append",
                f"sig+delta://{state}?mode=append",
            ],
        )
    surv = {r.doc_id for r in read_delta_lite(spark, corpus).collect()}
    full = incremental_minhash_dedup(
        minhash_signatures(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"),
            hash_family="fast",
        ),
        None,
    )
    full_surv = {r.id for r in full.collect() if r.dup_of is None}
    assert surv == full_surv
    assert read_delta_lite(spark, state).count() == 500


def test_incremental_dedup_monotone_id_contract(spark, tmp_path):
    """The incremental tiers' correctness depends on arrival order ==
    id order (smaller id == earlier). The URI layer VALIDATES that by
    default — feeding a batch whose ids do not all sort after the
    state fails loudly with the assign-ids:// remedy — and
    validate-ids=false opts out for callers who accept the risk."""
    import pytest

    from spark_etl_cli_spark.pipeline import run_pipeline
    from tests.conftest import SF_DIR

    state = str(tmp_path / "state")

    def run(pred, extra=""):
        run_pipeline(
            spark,
            sources=[
                f"docs+parquet://{SF_DIR}/documents.parquet?where={pred}"
            ],
            transforms=[
                "docs+dec+dedup://?mode=incremental&tier=minhash"
                f"&state={state}&hash-family=fast&first-batch=true{extra}",
                "dec+sig+sql://SELECT doc_id AS id, signature FROM dec",
            ],
            sinks=[f"sig+delta://{state}?mode=append"],
        )

    run("doc_id > 249")  # state now holds ids 250..499
    with pytest.raises(ValueError, match="assign-ids"):
        run("doc_id <= 249")  # out-of-order batch: must fail loudly
    run("doc_id <= 249", extra="&validate-ids=false")  # explicit opt-out


def test_incremental_dedup_missing_state_signals(spark, tmp_path):
    """state= resolving to NOTHING is ambiguous (first batch vs typo):
    default warns loudly, first-batch=true silences, require-state=true
    raises."""
    import warnings

    import pytest

    from spark_etl_cli_spark.registry import resolve_transform
    from tests.conftest import SF_DIR

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(5)
    missing = str(tmp_path / "nope")

    _, fn = resolve_transform(
        f"a+b+dedup://?mode=incremental&tier=exact&state={missing}"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fn(spark, df)
        assert any("resolves to NOTHING" in str(x.message) for x in w)

    _, fn_fb = resolve_transform(
        f"a+b+dedup://?mode=incremental&tier=exact&state={missing}"
        "&first-batch=true"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fn_fb(spark, df)
        assert not any("resolves to NOTHING" in str(x.message) for x in w)

    _, fn_req = resolve_transform(
        f"a+b+dedup://?mode=incremental&tier=exact&state={missing}"
        "&require-state=true"
    )
    with pytest.raises(ValueError, match="require-state"):
        fn_req(spark, df)
