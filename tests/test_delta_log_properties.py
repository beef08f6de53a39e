"""Property tests for the Delta log state machine (export_delta):
over ANY action history — adds, removes, re-adds, metaData changes,
arbitrary grouping into commit versions — the replay must equal a
straightforward reference fold, time travel must be total, and a
parquet checkpoint written at ANY version must make the
checkpoint+tail bootstrap indistinguishable from full JSON replay
(including after the JSON prefix is retention-expired). This is the
same style of proof the commitlog ledger carries
(test_ledger_properties.py), applied to the interop layer."""

from __future__ import annotations

import json
import os
import uuid

from hypothesis import given, settings, strategies as st

from curator_spark.export_delta import (_replay_delta_log,
                                        _write_delta_checkpoint)

_SCHEMA = json.dumps({"type": "struct", "fields": [
    {"name": "id", "type": "long", "nullable": True, "metadata": {}},
    {"name": "part", "type": "integer", "nullable": True,
     "metadata": {}}]})

# an action program: each element is one commit version's action list
_PATHS = [f"f{i:02d}.parquet" for i in range(8)]
_ACTION = st.one_of(
    st.builds(lambda p, s: {"add": {
        "path": p, "partitionValues": {"part": "0"}, "size": s,
        "modificationTime": 0, "dataChange": True,
        "stats": json.dumps({"numRecords": s})}},
        st.sampled_from(_PATHS), st.integers(1, 500)),
    st.builds(lambda p: {"remove": {
        "path": p, "deletionTimestamp": 0, "dataChange": True}},
        st.sampled_from(_PATHS)),
    st.builds(lambda n: {"metaData": {
        "id": "prop-1", "name": n,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _SCHEMA, "partitionColumns": ["part"],
        "configuration": {}, "createdTime": 0}},
        st.sampled_from(["a", "b", "c"])),
)
_PROGRAM = st.lists(st.lists(_ACTION, min_size=1, max_size=5),
                    min_size=1, max_size=12)


def _write_log(root: str, program) -> None:
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    for v, actions in enumerate(program):
        payload = [{"protocol": {"minReaderVersion": 1,
                                 "minWriterVersion": 2}}] \
            if v == 0 else []
        payload += actions
        with open(os.path.join(log, f"{v:020d}.json"), "w") as f:
            f.write("\n".join(json.dumps(a) for a in payload))


def _reference_fold(program, upto):
    live: dict = {}
    meta = None
    for v, actions in enumerate(program):
        if v > upto:
            break
        for a in actions:
            if "add" in a:
                live[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                live.pop(a["remove"]["path"], None)
            elif "metaData" in a:
                meta = a["metaData"]
    return live, meta


@settings(max_examples=60, deadline=None)
@given(_PROGRAM, st.data())
def test_replay_equals_reference_fold_and_time_travel(program, data):
    root = f"/tmp/delta_props/{uuid.uuid4().hex}"
    _write_log(root, program)
    head = len(program) - 1
    for v in (0, head, data.draw(st.integers(0, head))):
        state = _replay_delta_log(os.path.join(root, "_delta_log"),
                                  upto=v)
        live, meta = _reference_fold(program, v)
        assert state["version"] == v
        assert state["live"] == live
        if meta is not None:
            assert state["schema_str"] == meta["schemaString"]
            assert state["partition_columns"] == ["part"]


@settings(max_examples=40, deadline=None)
@given(_PROGRAM, st.data())
def test_checkpoint_bootstrap_equals_full_replay(program, data):
    """Write the spec checkpoint at a random version, expire the JSON
    prefix, and require bootstrap ≡ full replay for the head and for
    every version at or after the checkpoint."""
    root = f"/tmp/delta_props/{uuid.uuid4().hex}"
    _write_log(root, program)
    # a checkpoint needs metaData to have appeared by then
    metas = [v for v, actions in enumerate(program)
             if any("metaData" in a for a in actions)]
    if not metas:
        return
    head = len(program) - 1
    ck = data.draw(st.integers(metas[0], head))
    log = os.path.join(root, "_delta_log")
    full_head = _replay_delta_log(log)
    _write_delta_checkpoint(log, ck, _replay_delta_log(log, upto=ck))
    for v in range(ck):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    boot_head = _replay_delta_log(log)
    assert boot_head["live"] == full_head["live"]
    assert boot_head["schema_str"] == full_head["schema_str"]
    assert boot_head["version"] == full_head["version"]
    probe = data.draw(st.integers(ck, head))
    want_live, _ = _reference_fold(program, probe)
    assert _replay_delta_log(log, upto=probe)["live"] == want_live
