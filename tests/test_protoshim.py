"""Unit pins for the vendored mini protobuf runtime
(flink_tutorial_broadcast_spark/vendor/google/protobuf/_mini.py).

The authoritative wire-format check is the JVM differential in
tests/test_streaming.py::test_tws_runs_for_real_via_protoshim (every
state request is parsed by the JVM's real protobuf); these tests pin
the runtime's local semantics: proto3 default omission, presence of
empty sub-messages (oneof arms), repeated fields, negative varints,
unknown-field tolerance, and the generated-module surface."""

from __future__ import annotations

import sys

import pytest

from flink_tutorial_broadcast_spark.protoshim import (
    VENDOR_DIR, ensure_protoshim, has_real_protobuf,
)


@pytest.fixture(scope="module", autouse=True)
def shim():
    mode = ensure_protoshim()
    assert mode in ("real", "mini")
    yield mode


@pytest.fixture(scope="module")
def sm(shim):
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm
    return sm


def test_shim_only_activates_without_real_protobuf(shim):
    if shim == "mini":
        assert not has_real_protobuf()
        assert any(VENDOR_DIR in p for p in sys.path)
    else:  # real wheel present: vendor tree must NOT shadow it
        import google.protobuf
        assert VENDOR_DIR not in google.protobuf.__file__


def test_descriptor_parse_builds_full_schema(sm):
    # every message the TWS clients construct must exist with fields
    for name in ("StateRequest", "StateResponse", "StateCallCommand",
                 "ValueStateCall", "ListStateCall", "MapStateCall",
                 "TimerStateCallCommand", "RegisterTimer", "TimerInfo",
                 "KeyAndValuePair", "StateResponseWithListGet",
                 "StateResponseWithMapIterator", "StateResponseWithTimer",
                 "SetImplicitKey", "RemoveImplicitKey", "SetHandleState",
                 "AppendList", "ListStatePut", "UpdateValue", "TTLConfig"):
        assert hasattr(sm, name), name
    # HandleState enum values exported at module level (proto3 style)
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED,
            sm.DATA_PROCESSED, sm.TIMER_PROCESSED, sm.CLOSED) \
        == (0, 1, 2, 3, 4, 5)


def test_roundtrip_nested_oneof_request(sm):
    cmd = sm.StateCallCommand()
    cmd.stateName = "agg"
    cmd.schema = '{"t":1}'
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd))
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    got = back.statefulProcessorCall.getValueState
    assert (got.stateName, got.schema) == ("agg", '{"t":1}')


def test_empty_submessage_is_emitted_for_oneof_presence(sm):
    # ValueStateCall(get=Get()) must wire the empty Get() — presence
    # selects the oneof arm on the JVM side
    call = sm.ValueStateCall(stateName="s", get=sm.Get())
    wire = call.SerializeToString()
    back = sm.ValueStateCall()
    back.ParseFromString(wire)
    assert "get" in back.__dict__["_v"]  # field arrived on the wire


def test_scalar_defaults_omitted_and_restored(sm):
    resp = sm.StateResponse(statusCode=0, errorMessage="", value=b"")
    assert resp.SerializeToString() == b""  # proto3: all defaults
    back = sm.StateResponse()
    back.ParseFromString(b"")
    assert (back.statusCode, back.errorMessage, back.value) == (0, "", b"")


def test_repeated_bytes_and_messages(sm):
    lst = sm.ListStatePut(value=[b"a", b"bb", b""], fetchWithArrow=True)
    back = sm.ListStatePut()
    back.ParseFromString(lst.SerializeToString())
    assert back.value == [b"a", b"bb", b""]
    assert back.fetchWithArrow is True

    resp = sm.StateResponseWithMapIterator(
        kvPair=[sm.KeyAndValuePair(key=b"k1", value=b"v1"),
                sm.KeyAndValuePair(key=b"k2", value=b"v2")],
        requireNextFetch=True)
    back2 = sm.StateResponseWithMapIterator()
    back2.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in back2.kvPair] \
        == [(b"k1", b"v1"), (b"k2", b"v2")]


def test_negative_and_large_int64_varints(sm):
    for v in (-1, -5, 2**62, 0, 1):
        t = sm.TimerInfo(timestampMs=v)
        back = sm.TimerInfo()
        back.ParseFromString(t.SerializeToString())
        assert back.timestampMs == v, v


def test_ttl_auto_vivification_writes_through(sm):
    cmd = sm.StateCallCommand()
    cmd.stateName = "x"
    cmd.ttl.durationMs = 9999  # the TWS client's exact pattern
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.ttl.durationMs == 9999


def test_unknown_fields_are_skipped(sm):
    # append an unknown varint field (field 15) — parser must ignore it
    wire = sm.SetImplicitKey(key=b"kk").SerializeToString()
    wire += bytes([15 << 3]) + bytes([42])
    back = sm.SetImplicitKey()
    back.ParseFromString(wire)
    assert back.key == b"kk"


def test_unknown_kwarg_and_attr_raise(sm):
    with pytest.raises(ValueError):
        sm.SetImplicitKey(nope=1)
    msg = sm.SetImplicitKey(key=b"k")
    with pytest.raises(AttributeError):
        msg.nope
