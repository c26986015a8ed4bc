"""Writer-protocol gate (_check_writer_protocol): mutations must honor
the table's minWriterVersion / writerFeatures contracts before
committing (Delta table-features spec; round-8 advice — previously a
DV table declaring rowTracking or an appendOnly table could be mutated
in violation of features this writer never implemented)."""

from __future__ import annotations

import json
import os

import pytest

from ballista_spark.sources.deltalog import (
    DeltaProtocolError,
    delete_from_delta_table,
    compact_delta_table,
    read_delta_snapshot,
    read_delta_table,
    update_delta_table,
    write_delta_table,
)


def _commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _make_table(spark, tmp_path, name="t"):
    table = str(tmp_path / name)
    df = spark.range(10).selectExpr("id", "id % 3 as cat")
    write_delta_table(df, table)
    return table


def _override(table, protocol=None, configuration=None, field_meta=None):
    """Append a commit that re-declares the protocol and/or metaData
    (schema preserved; ``field_meta`` maps column -> metadata dict)."""
    snap = read_delta_snapshot(table)
    schema = json.loads(snap.schema.json())
    for fld in schema["fields"]:
        if field_meta and fld["name"] in field_meta:
            fld["metadata"] = field_meta[fld["name"]]
    actions = []
    if protocol is not None:
        actions.append({"protocol": protocol})
    actions.append(
        {
            "metaData": {
                "id": "m2",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": snap.partition_columns,
                "configuration": configuration or {},
                "createdTime": 0,
            }
        }
    )
    _commit(table, snap.version + 1, actions)


def test_append_only_config_refuses_removes(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    _override(
        table,
        protocol={"minReaderVersion": 1, "minWriterVersion": 2},
        configuration={"delta.appendOnly": "true"},
    )
    with pytest.raises(DeltaProtocolError, match="append-only"):
        delete_from_delta_table(spark, table, [("id", "<", 3)])
    # appends stay legal on an appendOnly table
    write_delta_table(spark.range(3).selectExpr("id", "id as cat"), table)
    assert read_delta_table(spark, table).count() == 13


def test_append_only_declared_but_unset_passes(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    _override(
        table,
        protocol={
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["appendOnly", "invariants"],
        },
    )
    assert delete_from_delta_table(spark, table, [("id", "<", 3)]) is not None
    assert read_delta_table(spark, table).count() == 7


def test_cdf_enabled_refuses_row_removals_allows_appends(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    _override(
        table,
        protocol={"minReaderVersion": 1, "minWriterVersion": 4},
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    with pytest.raises(DeltaProtocolError, match="cdc"):
        delete_from_delta_table(spark, table, [("id", "<", 3)])
    with pytest.raises(DeltaProtocolError, match="cdc"):
        update_delta_table(spark, table, {"cat": "0"}, [("id", "<", 3)])
    write_delta_table(spark.range(2).selectExpr("id", "id as cat"), table)
    # OPTIMIZE is dataChange=false — derivable without cdc files
    compact_delta_table(spark, table, target_file_bytes=1 << 30)
    assert read_delta_table(spark, table).count() == 12


def test_unknown_writer_feature_refuses_all_mutations(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    _override(
        table,
        protocol={
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["rowTracking", "appendOnly"],
        },
    )
    for attempt in (
        lambda: delete_from_delta_table(spark, table, [("id", "<", 3)]),
        lambda: update_delta_table(spark, table, {"cat": "0"}),
        lambda: write_delta_table(
            spark.range(2).selectExpr("id", "id as cat"), table
        ),
        lambda: compact_delta_table(spark, table),
    ):
        with pytest.raises(DeltaProtocolError, match="rowTracking"):
            attempt()


def test_future_writer_version_refuses(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    _override(table, protocol={"minReaderVersion": 1, "minWriterVersion": 8})
    with pytest.raises(DeltaProtocolError, match="minWriterVersion=8"):
        delete_from_delta_table(spark, table, [("id", "<", 3)])


def test_invariants_refuse_new_rows_only(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    _override(
        table,
        protocol={"minReaderVersion": 1, "minWriterVersion": 2},
        field_meta={
            "id": {
                "delta.invariants": json.dumps(
                    {"expression": {"expression": "id > 0"}}
                )
            }
        },
    )
    with pytest.raises(DeltaProtocolError, match="invariants"):
        write_delta_table(
            spark.range(2).selectExpr("id", "id as cat"), table
        )
    # DELETE carries existing (already-valid) rows: allowed
    assert delete_from_delta_table(spark, table, [("id", "<", 3)]) is not None


def test_generated_and_identity_columns_refuse_value_changes(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    _override(
        table,
        protocol={"minReaderVersion": 1, "minWriterVersion": 6},
        field_meta={"cat": {"delta.generationExpression": "id % 3"}},
    )
    with pytest.raises(DeltaProtocolError, match="generated"):
        update_delta_table(spark, table, {"cat": "7"})
    _override(
        table,
        protocol={"minReaderVersion": 1, "minWriterVersion": 6},
        field_meta={
            "cat": {},  # clear the generated-column metadata set above
            "id": {"delta.identity.start": 1, "delta.identity.step": 1},
        },
    )
    with pytest.raises(DeltaProtocolError, match="identity"):
        update_delta_table(spark, table, {"cat": "7"})


def test_check_constraints_refuse_new_rows(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    _override(
        table,
        protocol={"minReaderVersion": 1, "minWriterVersion": 3},
        configuration={"delta.constraints.pos": "id >= 0"},
    )
    with pytest.raises(DeltaProtocolError, match="constraints"):
        write_delta_table(
            spark.range(2).selectExpr("id", "id as cat"), table
        )
    assert delete_from_delta_table(spark, table, [("id", "<", 3)]) is not None


def test_dv_upgrade_enumerates_full_legacy_feature_set(spark, tmp_path):
    """Upgrading a legacy minWriterVersion=5 table to v7 for DV writes
    must enumerate EVERY implied legacy feature, not just version 2's
    (round-8 advice: dropping checkConstraints/changeDataFeed/... from
    writerFeatures makes other writers stop enforcing them)."""
    table = _make_table(spark, tmp_path)
    _override(table, protocol={"minReaderVersion": 1, "minWriterVersion": 5})
    v = delete_from_delta_table(
        spark, table, [("id", "<", 2)], use_deletion_vectors=True
    )
    assert v is not None
    snap = read_delta_snapshot(table)
    wf = set(snap.protocol["writerFeatures"])
    assert {
        "appendOnly",
        "invariants",
        "checkConstraints",
        "changeDataFeed",
        "generatedColumns",
        "columnMapping",
        "deletionVectors",
    } <= wf
    assert "identityColumns" not in wf  # version 6's addition, not 5's
    assert read_delta_table(spark, table).count() == 8
