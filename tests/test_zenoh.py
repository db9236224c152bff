"""Zenoh API adapter: config/env parsing, credential injection,
attachment codecs, NTP64 timestamp rules, key-expression routing, and
the subscriber/queryable pipelines end-to-end over a RecordStore
(reference: api/zenoh.rs, api/zenoh/{subscriber,queryable,session,
attachments}.rs, cfg/zenoh.rs)."""

import json
import os
import tempfile

import pytest

from reductstore_spark.sources.store import RecordStore
from reductstore_spark.sources.zenoh import (
    FALLBACK_ZENOH_SOURCE_ID,
    InProcZenohSession,
    InvalidZenohConfig,
    IngestError,
    QueryAttachments,
    QueryError,
    Reply,
    ReplyError,
    SubscriberPipeline,
    ZenohApiConfig,
    ZenohTimestamp,
    build_reply_timestamp,
    build_zenoh_config,
    deserialize_labels,
    deserialize_query_attachments,
    ensure_bucket_exists,
    inject_credentials,
    keyexpr_matches,
    ntp64_from_micros,
    ntp64_to_micros,
    parse_inline_config,
    parse_last_param,
    parse_locality,
    parse_selector,
    parse_strict_param,
    parse_time_range_params,
    parse_timestamp_from_labels,
    parse_timestamp_param,
    serialize_labels,
    spawn_runtime,
    timestamp_from_microseconds,
)

US = 1_000_000


# ---------------------------------------------------------------------------
# config (cfg/zenoh.rs, session.rs:169-367)
# ---------------------------------------------------------------------------

def test_config_defaults_disabled():
    cfg = ZenohApiConfig()
    assert cfg.enabled is False
    assert cfg.bucket == "zenoh"
    assert cfg.sub_keyexprs is None and cfg.query_keyexprs is None
    assert cfg.query_locality == "Any"


def test_config_from_env():
    env = {
        "RS_ZENOH_ENABLED": "true",
        "RS_ZENOH_CONFIG": "mode=client",
        "RS_ZENOH_BUCKET": "telemetry",
        "RS_ZENOH_SUB_KEYEXPRS": "sensors/**",
        "RS_ZENOH_QUERY_KEYEXPRS": "**",
        "RS_ZENOH_QUERY_LOCALITY": "remote",
        "RS_ZENOH_TLS_ROOT_CA": "ca-pem",
    }
    cfg = ZenohApiConfig.from_env(env)
    assert cfg.enabled and cfg.bucket == "telemetry"
    assert cfg.sub_keyexprs == "sensors/**"
    assert cfg.query_locality == "Remote"
    assert cfg.tls_root_ca_cert == "ca-pem"
    assert ZenohApiConfig.from_env({}).enabled is False


def test_parse_locality_variants():
    assert parse_locality("sessionlocal") == "SessionLocal"
    assert parse_locality("ANY") == "Any"
    with pytest.raises(InvalidZenohConfig):
        parse_locality("everywhere")


def test_parse_inline_simple_and_nested():
    assert parse_inline_config("mode=client") == {"mode": "client"}
    cfg = parse_inline_config("mode=client;scouting/multicast/enabled=false")
    assert cfg == {"mode": "client",
                   "scouting": {"multicast": {"enabled": False}}}


def test_parse_inline_arrays_numbers_and_empty_parts():
    cfg = parse_inline_config(
        "connect/endpoints=[tcp/10.0.0.1:7447, tcp/10.0.0.2:7447];"
        "timeout=5;;")
    assert cfg["connect"]["endpoints"] == [
        "tcp/10.0.0.1:7447", "tcp/10.0.0.2:7447"]
    assert cfg["timeout"] == 5


def test_parse_inline_json5_and_errors():
    assert parse_inline_config('{ mode: "client" }') == {"mode": "client"}
    with pytest.raises(InvalidZenohConfig, match="expected key=value"):
        parse_inline_config("mode")
    with pytest.raises(InvalidZenohConfig, match="Invalid JSON5"):
        parse_inline_config("{ invalid json }")


def test_build_config_requires_source(tmp_path):
    with pytest.raises(InvalidZenohConfig,
                       match="RS_ZENOH_CONFIG or RS_ZENOH_CONFIG_PATH"):
        build_zenoh_config(ZenohApiConfig(enabled=True))
    with pytest.raises(InvalidZenohConfig, match="does not exist"):
        build_zenoh_config(ZenohApiConfig(
            enabled=True, config_path=str(tmp_path / "nope.json5")))
    p = tmp_path / "z.json5"
    p.write_text('{ mode: "peer" }  // comment\n')
    cfg, cred = build_zenoh_config(ZenohApiConfig(
        enabled=True, config_path=str(p)))
    assert cfg["mode"] == "peer"
    cred.cleanup()


def test_inject_credentials_roundtrip():
    zcfg = {}
    cred = inject_credentials(zcfg, ZenohApiConfig(
        tls_root_ca_cert="root-ca-content",
        tls_connect_cert="client-cert",
        tls_connect_key="client-key",
        auth_dictionary="user1:pass1\nuser2:pass2"))
    try:
        tls = zcfg["transport"]["link"]["tls"]
        assert open(tls["root_ca_certificate"]).read() == "root-ca-content"
        assert open(tls["connect_certificate"]).read() == "client-cert"
        assert open(tls["connect_private_key"]).read() == "client-key"
        dict_path = zcfg["transport"]["auth"]["usrpwd"]["dictionary_file"]
        assert open(dict_path).read() == "user1:pass1\nuser2:pass2"
        assert os.path.basename(tls["root_ca_certificate"]).startswith(
            "zenoh_root_ca")
    finally:
        cred.cleanup()
    assert not os.path.exists(tls["root_ca_certificate"])


def test_inject_credentials_failure_cleans_temp_files():
    # the reference's NamedTempFile auto-deletes on drop — a mid-way
    # _config_insert failure must not strand already-written secrets
    zcfg = {"transport": "not-a-section"}
    with pytest.raises(InvalidZenohConfig, match="not a section"):
        inject_credentials(zcfg, ZenohApiConfig(
            tls_root_ca_cert="root-ca-content"))
    leftovers = [f for f in os.listdir(tempfile.gettempdir())
                 if f.startswith("zenoh_root_ca")]
    assert leftovers == []


def test_spawn_failure_cleans_credentials(spark, tmp_path, monkeypatch):
    # spawn_runtime failing AFTER build_zenoh_config (bootstrap/declare
    # error) must cleanup the injected credential files before re-raising
    import reductstore_spark.sources.zenoh as Z

    def boom(self):
        raise RuntimeError("bootstrap failed")

    monkeypatch.setattr(Z.SubscriberPipeline, "bootstrap", boom)
    store = RecordStore(spark, str(tmp_path / "s"))
    config = ZenohApiConfig(
        enabled=True, config_inline="mode=client", sub_keyexprs="**",
        auth_dictionary="user:pass")
    with pytest.raises(RuntimeError, match="bootstrap failed"):
        spawn_runtime(config, store)
    leftovers = [f for f in os.listdir(tempfile.gettempdir())
                 if f.startswith("zenoh_auth_dict")]
    assert leftovers == []


def test_inject_no_credentials_leaves_config_unchanged():
    zcfg = {"mode": "client"}
    cred = inject_credentials(zcfg, ZenohApiConfig())
    assert zcfg == {"mode": "client"}
    assert cred.tls_root_ca is None and cred.auth_dictionary is None


# ---------------------------------------------------------------------------
# attachments (attachments.rs)
# ---------------------------------------------------------------------------

def test_labels_roundtrip_and_errors():
    labels = {"sensor": "imu", "unit": "m/s^2"}
    assert deserialize_labels(serialize_labels(labels)) == labels
    with pytest.raises(ValueError):
        deserialize_labels(b"not-json")
    with pytest.raises(ValueError):
        deserialize_labels(b'{"a": 1}')  # Labels = map<string,string>


def test_query_attachments():
    att = deserialize_query_attachments(b'{"when": {"&label": "value"}}')
    assert att.when == {"&label": "value"}
    assert deserialize_query_attachments(b"{}").when is None
    with pytest.raises(ValueError):
        deserialize_query_attachments(b"[1]")


# ---------------------------------------------------------------------------
# NTP64 timestamps (session.rs:709-770)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("us", [0, 1, 999_999, 42 * US,
                                1_704_067_200 * US + 123_456])
def test_ntp64_roundtrips_microseconds(us):
    assert ntp64_to_micros(ntp64_from_micros(us)) == us


def test_reply_timestamp_prefers_label_values():
    ts = ZenohTimestamp.from_micros(42 * US, 99)
    labels = {"zenoh_ts_ntp64": str(ts.ntp64), "zenoh_source_id": "99"}
    got = build_reply_timestamp(labels, 1)
    assert got.ntp64 == ts.ntp64 and got.source_id == "99"


def test_timestamp_from_microseconds_source_id_paths():
    got = timestamp_from_microseconds({"zenoh_source_id": "123"}, 500_000)
    assert got.source_id == "123" and got.to_micros() == 500_000
    fell = timestamp_from_microseconds({}, 750_000)
    assert fell.source_id == str(FALLBACK_ZENOH_SOURCE_ID)
    bad = timestamp_from_microseconds({"zenoh_source_id": "zid"}, 1)
    assert bad.source_id == str(FALLBACK_ZENOH_SOURCE_ID)


def test_bad_ntp64_label_falls_back_to_record_micros():
    labels = {"zenoh_ts_ntp64": "not-a-number", "zenoh_source_id": "5"}
    assert parse_timestamp_from_labels(labels) is None
    got = build_reply_timestamp(labels, 9 * US)
    assert got.to_micros() == 9 * US and got.source_id == "5"


# ---------------------------------------------------------------------------
# key expressions + selectors
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("declared,key,match", [
    ("**", "a/b/c", True),
    ("**", "a", True),
    ("a/*/c", "a/b/c", True),
    ("a/*/c", "a/c", False),
    ("a/**", "a", True),
    ("a/**", "a/b/c", True),
    ("a/**/d", "a/d", True),
    ("a/**/d", "a/b/c/d", True),
    ("a/**/d", "a/b/c", False),
    ("sensor$*", "sensor42", True),
    ("sensor$*", "actuator42", False),
    ("a/b", "a/b", True),
    ("a/b", "a/c", False),
])
def test_keyexpr_matching(declared, key, match):
    assert keyexpr_matches(declared, key) is match


def test_parse_selector():
    key, params = parse_selector("sensors/temp?start=1&stop=2&last=true")
    assert key == "sensors/temp"
    assert params == {"start": "1", "stop": "2", "last": "true"}
    assert parse_selector("a/b") == ("a/b", {})


# ---------------------------------------------------------------------------
# queryable parameter parsing (queryable.rs:149-216)
# ---------------------------------------------------------------------------

def test_param_parsing_happy_paths():
    assert parse_timestamp_param({"ts": "123"}) == 123
    assert parse_timestamp_param({}) is None
    assert parse_last_param({"last": "true"}) is True
    assert parse_last_param({"last": "false"}) is False
    assert parse_last_param({}) is False
    assert parse_strict_param({}) is None
    assert parse_strict_param({"strict": "true"}) is True
    assert parse_time_range_params({"start": "100", "stop": "200"}) == \
        (100, 200)
    assert parse_time_range_params({}) == (None, None)


@pytest.mark.parametrize("fn,params,msg", [
    (parse_timestamp_param, {"ts": "abc"},
     "'ts' must be an unsigned integer"),
    (parse_timestamp_param, {"ts": "-1"},
     "'ts' must be an unsigned integer"),
    (parse_last_param, {"last": "abc"}, "'last' must be a boolean value"),
    (parse_strict_param, {"strict": "1"},
     "'strict' must be a boolean value"),
    (parse_time_range_params, {"start": "x"},
     "'start' must be an unsigned integer"),
    (parse_time_range_params, {"start": "1", "stop": "x"},
     "'stop' must be an unsigned integer"),
])
def test_param_parsing_errors_match_reference(fn, params, msg):
    with pytest.raises(QueryError) as err:
        fn(params)
    assert str(err.value) == msg and err.value.kind == "param"


# ---------------------------------------------------------------------------
# end-to-end runtime over a RecordStore
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def zenoh_env(spark, tmp_path_factory):
    """One runtime, a handful of published samples, shared across the
    read-only tests below."""
    root = str(tmp_path_factory.mktemp("zenoh") / "store")
    store = RecordStore(spark, root)
    config = ZenohApiConfig(
        enabled=True, config_inline="mode=client",
        sub_keyexprs="sensors/**", query_keyexprs="**")
    runtime = spawn_runtime(config, store, now_us=lambda: 4 * US)
    s = runtime.session

    def put(key, us, value, src=7):
        ts = ZenohTimestamp.from_micros(us, src)
        return s.put(key, json.dumps({"v": value}).encode(),
                     encoding="application/json",
                     attachment=serialize_labels({"value": str(value)}),
                     timestamp=ts)

    assert put("sensors/temp", 1 * US, 10) == 1
    assert put("sensors/temp", 2 * US, 20) == 1
    assert put("sensors/temp", 3 * US, 30) == 1
    # trimmed key, no attachment, no timestamp -> injected clock
    assert s.put("/sensors/hum/", b"h1") == 1
    # outside the subscriber's key expression: never delivered
    assert s.put("other/x", b"nope") == 0
    yield store, runtime
    runtime.shutdown()


def test_spawn_runtime_disabled(spark, tmp_path):
    store = RecordStore(spark, str(tmp_path / "s"))
    assert spawn_runtime(ZenohApiConfig(), store) is None


def test_spawn_runtime_requires_config(spark, tmp_path):
    store = RecordStore(spark, str(tmp_path / "s"))
    with pytest.raises(InvalidZenohConfig):
        spawn_runtime(ZenohApiConfig(enabled=True,
                                     sub_keyexprs="**"), store)


def test_subscriber_ingests_samples(zenoh_env):
    store, _ = zenoh_env
    entries = dict.fromkeys(e for _, e in store.entries("zenoh"))
    assert set(entries) == {"sensors/temp", "sensors/hum"}
    rows = {r["ts"]: r for r in store.read().where(
        "entry = 'sensors/temp'").collect()}
    assert set(rows) == {1 * US, 2 * US, 3 * US}
    r = rows[2 * US]
    assert bytes(r["payload"]) == b'{"v": 20}'
    assert r["content_type"] == "application/json"
    # attachment labels + zenoh source labels (source wins on clash)
    assert r["labels"]["value"] == "20"
    assert r["labels"]["zenoh_source_id"] == "7"
    assert int(r["labels"]["zenoh_ts_ntp64"]) == ntp64_from_micros(2 * US)


def test_subscriber_trims_key_and_stamps_clock(zenoh_env):
    store, _ = zenoh_env
    row = store.read().where("entry = 'sensors/hum'").collect()[0]
    assert row["ts"] == 4 * US  # injected now_us
    assert row["labels"] == {}


def test_bucket_autocreated(zenoh_env):
    store, _ = zenoh_env
    with open(store._settings_file()) as fh:
        assert "zenoh" in json.load(fh)


def test_query_exact_timestamp(zenoh_env):
    _, runtime = zenoh_env
    replies = runtime.session.get("sensors/temp?ts=2000000")
    assert len(replies) == 1
    r = replies[0]
    assert isinstance(r, Reply)
    assert r.payload == b'{"v": 20}'
    assert r.encoding == "application/json"
    assert deserialize_labels(r.attachment)["value"] == "20"
    # label-preferred timestamp reproduces the put's NTP64 exactly
    assert r.timestamp.ntp64 == ntp64_from_micros(2 * US)
    assert r.timestamp.source_id == "7"


def test_reply_carries_query_key_expr_verbatim(zenoh_env):
    # session.rs:606,681 — replies clone the QUERY's key expression,
    # which keeps surrounding slashes the entry name had trimmed
    _, runtime = zenoh_env
    (r,) = runtime.session.get("/sensors/temp/?ts=2000000")
    assert isinstance(r, Reply)
    assert r.key_expr == "/sensors/temp/"
    assert r.payload == b'{"v": 20}'


def test_query_last(zenoh_env):
    _, runtime = zenoh_env
    replies = runtime.session.get("sensors/hum?last=true")
    assert len(replies) == 1
    # no zenoh labels on this record -> microsecond + fallback-id path
    assert replies[0].timestamp.to_micros() == 4 * US
    assert replies[0].timestamp.source_id == "1"


def test_query_stream_with_range_and_when(zenoh_env):
    _, runtime = zenoh_env
    replies = runtime.session.get(
        "sensors/temp?start=1000000&stop=4000000",
        attachment=json.dumps(
            {"when": {"&value": {"$gt": 15}}}).encode())
    got = sorted(r.timestamp.to_micros() for r in replies)
    assert got == [2 * US, 3 * US]
    assert all(isinstance(r, Reply) for r in replies)


def test_query_param_errors_reply_err(zenoh_env):
    _, runtime = zenoh_env
    (err,) = runtime.session.get("sensors/temp?ts=abc")
    assert isinstance(err, ReplyError)
    assert err.message == "'ts' must be an unsigned integer"


def test_query_not_found_errors(zenoh_env):
    _, runtime = zenoh_env
    # queryable.rs:89 resolves get_entry() before any branch — a
    # non-existent entry replies the bucket.rs:123-134 not-found shape
    # regardless of selector params (last=true, ts=, or a plain stream)
    (err,) = runtime.session.get("sensors/none?last=true")
    assert "Entry 'sensors/none' not found in bucket 'zenoh'" in err.message
    (err,) = runtime.session.get("sensors/none")
    assert "Entry 'sensors/none' not found in bucket 'zenoh'" in err.message
    (err,) = runtime.session.get("sensors/temp?ts=99")
    assert "Record 99 not found in entry zenoh/sensors/temp" in err.message


def test_query_last_unfinished_record_errors(spark, tmp_path):
    # entry.info() counts records of every state but begin_read rejects
    # unfinished ones (read_record.rs:44-60): last=true with a STARTED
    # latest record must surface the reference's too_early message, not
    # an IndexError
    from reductstore_spark.schema import (RECORDS_SCHEMA, STATE_FINISHED,
                                          STATE_STARTED)
    store = RecordStore(spark, str(tmp_path / "s"))
    rows = [("zenoh", "e1", 1 * US, b"a", "text/plain", STATE_FINISHED,
             {}, {}),
            ("zenoh", "e1", 2 * US, b"b", "text/plain", STATE_STARTED,
             {}, {})]
    store.write(spark.createDataFrame(rows, RECORDS_SCHEMA))
    config = ZenohApiConfig(enabled=True, config_inline="mode=client",
                            query_keyexprs="**")
    runtime = spawn_runtime(config, store)
    try:
        (err,) = runtime.session.get("e1?last=true")
        assert isinstance(err, ReplyError)
        assert (f"Record with timestamp {2 * US} in zenoh/e1 "
                "is still being written") in err.message
    finally:
        runtime.shutdown()


def test_malformed_attachment_downgrades_to_empty_labels(
        spark, tmp_path):
    store = RecordStore(spark, str(tmp_path / "s"))
    pipe = SubscriberPipeline(
        ZenohApiConfig(bucket="b1"), store, now_us=lambda: 5)
    out = pipe.handle_sample("e1", b"x", attachment=b"not-json")
    assert out == {"bucket": "b1", "entry": "e1", "ts": 5, "size": 1}
    assert store.read().collect()[0]["labels"] == {}


def test_ingress_limit_rejects_sample(spark, tmp_path):
    # subscriber.rs:189-213 — the limits hook rejects before any write
    def deny(n):
        raise RuntimeError(f"too many ingress bytes: {n}")

    store = RecordStore(spark, str(tmp_path / "s"))
    pipe = SubscriberPipeline(ZenohApiConfig(), store, check_ingress=deny)
    with pytest.raises(IngestError, match="ingress bytes"):
        pipe.handle_sample("e1", b"ab")
    assert store.read().count() == 0


def test_subscriber_api_limit_rejects_second_sample(spark, tmp_path):
    # subscriber.rs:215-251 — the api-request limit rejects the write
    # path too: first sample lands, second is refused before any write
    calls = {"n": 0}

    def limit_once():
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("too many api requests")

    store = RecordStore(spark, str(tmp_path / "s"))
    pipe = SubscriberPipeline(ZenohApiConfig(bucket="b1"), store,
                              check_api_request=limit_once,
                              now_us=lambda: 1)
    assert pipe.handle_sample("e", b"a", timestamp=101)["ts"] == 101
    with pytest.raises(IngestError, match="api requests"):
        pipe.handle_sample("e", b"a", timestamp=102)
    assert store.read().count() == 1


def test_api_limit_replies_error(spark, tmp_path):
    # session.rs:499-508 — rate-limited queries answer with reply_err
    calls = {"n": 0}

    def limit_once():
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("too many api requests")

    store = RecordStore(spark, str(tmp_path / "s"))
    config = ZenohApiConfig(enabled=True, config_inline="mode=client",
                            query_keyexprs="**")
    runtime = spawn_runtime(config, store)
    runtime.queryable.check_api_request = limit_once
    try:
        first = runtime.session.get("e?last=true")
        # storage err: the entry was never created in the empty store
        assert "Entry 'e' not found in bucket 'zenoh'" in first[0].message
        (second,) = runtime.session.get("e?last=true")
        assert isinstance(second, ReplyError)
        assert second.message == "too many api requests"
    finally:
        runtime.shutdown()


def test_stream_reply_respects_batch_max_records(zenoh_env):
    from reductstore_spark.functions.cursor import IoSettings
    _, runtime = zenoh_env
    pipe = runtime.queryable
    result = pipe.handle_query("sensors/temp", {}, QueryAttachments())
    result.io = IoSettings(batch_max_records=2)
    assert len(pipe.reply_for(result)) == 2


def test_queryable_locality_filters_origins(zenoh_env):
    _, runtime = zenoh_env
    s = InProcZenohSession()
    s.declare_queryable("**", lambda q: [ReplyError(b"hi")],
                        allowed_origin="Remote")
    assert s.get("x", origin="SessionLocal") == []
    assert len(s.get("x", origin="Remote")) == 1


def test_shutdown_undeclares(spark, tmp_path):
    store = RecordStore(spark, str(tmp_path / "s"))
    config = ZenohApiConfig(enabled=True, config_inline="mode=client",
                            sub_keyexprs="**", query_keyexprs="**")
    runtime = spawn_runtime(config, store)
    runtime.shutdown()
    assert runtime.session.put("a/b", b"x") == 0
    assert runtime.session.get("a/b?last=true") == []


def test_ensure_bucket_exists_idempotent(spark, tmp_path):
    store = RecordStore(spark, str(tmp_path / "s"))
    ensure_bucket_exists(store, "zb")
    before = open(store._settings_file()).read()
    ensure_bucket_exists(store, "zb")
    assert open(store._settings_file()).read() == before


# -- key-expression metamorphic properties (hypothesis) ----------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    _chunks = st.lists(st.sampled_from(["a", "b", "ab", "x1"]),
                       min_size=1, max_size=5)

    @settings(max_examples=200, deadline=None)
    @given(_chunks, st.data())
    def test_keyexpr_generalization_still_matches(chunks, data):
        """Replacing any chunk of a concrete key with ``*``, or any run
        of chunks with ``**``, must keep matching that key."""
        key = "/".join(chunks)
        pattern = list(chunks)
        i = data.draw(st.integers(0, len(chunks) - 1))
        j = data.draw(st.integers(i, len(chunks) - 1))
        mode = data.draw(st.sampled_from(["star", "dstar", "suffix"]))
        if mode == "star":
            pattern[i] = "*"
        elif mode == "dstar":
            pattern[i:j + 1] = ["**"]
        else:
            pattern[i:] = ["**"]
        assert keyexpr_matches("/".join(pattern), key)

    @settings(max_examples=200, deadline=None)
    @given(_chunks, st.data())
    def test_keyexpr_foreign_chunk_never_matches(chunks, data):
        """Changing one literal chunk to a token outside the alphabet
        breaks the match, however the others are wildcarded — unless a
        ``**`` spans the changed position."""
        key = "/".join(chunks)
        pattern = list(chunks)
        i = data.draw(st.integers(0, len(chunks) - 1))
        pattern[i] = "FOREIGN"
        assert not keyexpr_matches("/".join(pattern), key)
        # but wildcarding that same position restores the match
        pattern[i] = "*"
        assert keyexpr_matches("/".join(pattern), key)

    @settings(max_examples=200, deadline=None)
    @given(_chunks)
    def test_keyexpr_exact_and_depth_properties(chunks):
        key = "/".join(chunks)
        assert keyexpr_matches(key, key)          # reflexive
        assert keyexpr_matches("**", key)         # top matches all
        # one extra concrete chunk changes the depth: plain key no
        # longer matches, a trailing ** absorbs it
        longer = key + "/zz"
        assert not keyexpr_matches(key, longer)
        assert keyexpr_matches(key + "/**", longer)
        assert keyexpr_matches(key + "/**", key)  # ** matches zero


# -- wire-seam conformance (runs wherever zenoh-python is installed) ---------

def test_zenoh_python_wire_seam_conformance():
    """The module docstring's conformance table, executable: every
    ``zenoh-python`` name the :class:`InProcZenohSession` seam maps to
    must exist with the claimed field surface.  Skips in this container
    (the ``zenoh`` library is an external dependency, same honest gate
    as the transformWithStateInPandas protobuf test); runs for real in
    any environment that installs ``eclipse-zenoh``."""
    zenoh = pytest.importorskip("zenoh")

    assert callable(zenoh.open)
    for name in ("declare_subscriber", "declare_queryable", "put", "get",
                 "close"):
        assert hasattr(zenoh.Session, name), f"Session.{name} missing"

    for attr in ("key_expr", "payload", "encoding", "attachment",
                 "timestamp"):
        assert hasattr(zenoh.Sample, attr), f"Sample.{attr} missing"

    for attr in ("key_expr", "parameters", "attachment", "reply",
                 "reply_err"):
        assert hasattr(zenoh.Query, attr), f"Query.{attr} missing"

    for attr in ("ok", "err"):
        assert hasattr(zenoh.Reply, attr), f"Reply.{attr} missing"
    assert hasattr(zenoh.ReplyError, "payload")

    assert hasattr(zenoh, "Timestamp")
    assert hasattr(zenoh, "Config")
    for name in ("undeclare",):
        assert hasattr(zenoh.Subscriber, name)
        assert hasattr(zenoh.Queryable, name)


# -- batch-ingest helper ------------------------------------------------------

def test_handle_samples_batches_into_one_write(spark, tmp_path):
    from reductstore_spark.sources.zenoh import Sample
    store = RecordStore(spark, str(tmp_path / "s"))
    writes = {"n": 0}
    orig = store.write

    def counting_write(df, *a, **kw):
        writes["n"] += 1
        return orig(df, *a, **kw)

    store.write = counting_write
    pipe = SubscriberPipeline(ZenohApiConfig(bucket="b1"), store,
                              now_us=lambda: 9)
    samples = [
        Sample("s/a", b"p1", "text/plain",
               serialize_labels({"k": "1"}),
               ZenohTimestamp.from_micros(1 * US, 7)),
        Sample("/s/b/", b"p22", "application/json", None, None),
        Sample("s/a", b"p333", "text/plain", b"not-json", None),
    ]
    out = pipe.handle_samples(samples)
    assert out == {"bucket": "b1", "records": 3, "bytes": 9,
                   "rejected": []}
    assert writes["n"] == 1  # the point of the helper

    rows = {(r["entry"], r["ts"]): r for r in store.read().collect()}
    assert set(rows) == {("s/a", 1 * US), ("s/b", 9), ("s/a", 9)}
    # per-sample semantics preserved: attachment labels + zenoh source
    # labels on the stamped sample; injected clock + trimmed key on the
    # bare one; malformed attachment downgrades to empty labels
    stamped = rows[("s/a", 1 * US)]
    assert stamped["labels"]["k"] == "1"
    assert stamped["labels"]["zenoh_source_id"] == "7"
    assert rows[("s/b", 9)]["content_type"] == "application/json"
    assert rows[("s/a", 9)]["labels"] == {}
    # empty batch: no write job at all
    assert pipe.handle_samples([]) == {"bucket": "b1", "records": 0,
                                       "bytes": 0, "rejected": []}
    assert writes["n"] == 1


def test_handle_samples_guard_rejects_whole_batch(spark, tmp_path):
    from reductstore_spark.sources.zenoh import Sample
    store = RecordStore(spark, str(tmp_path / "s"))

    def deny_big(n):
        if n > 2:
            raise RuntimeError(f"too many ingress bytes: {n}")

    pipe = SubscriberPipeline(ZenohApiConfig(bucket="b1"), store,
                              check_ingress=deny_big, now_us=lambda: 1)
    with pytest.raises(IngestError, match="ingress bytes"):
        pipe.handle_samples([Sample("e", b"ok", "t", None, None),
                             Sample("e", b"toobig", "t", None, None)])
    assert store.read().count() == 0  # all-or-nothing


def test_handle_samples_same_key_last_wins(spark, tmp_path):
    """Two batch samples landing on the same (entry, ts) — the
    untimestamped high-rate scenario where both get stamped with the
    same current-time microsecond — must store exactly what N
    sequential handle_zenoh_sample calls would (newest sample wins),
    and the returned counts must reflect what the store serves, not
    the raw batch size."""
    from reductstore_spark.sources.zenoh import Sample
    store = RecordStore(spark, str(tmp_path / "s"))
    pipe = SubscriberPipeline(ZenohApiConfig(bucket="b1"), store,
                              now_us=lambda: 5)
    out = pipe.handle_samples([
        Sample("e", b"first", "t", serialize_labels({"v": "1"}), None),
        Sample("e", b"second!", "t", serialize_labels({"v": "2"}), None),
        Sample("other", b"x", "t", None, None),
    ])
    assert out == {"bucket": "b1", "records": 2, "bytes": 8,
                   "rejected": []}
    rows = {(r["entry"], r["ts"]): r for r in store.read().collect()}
    assert set(rows) == {("e", 5), ("other", 5)}
    assert bytes(rows[("e", 5)]["payload"]) == b"second!"
    assert rows[("e", 5)]["labels"] == {"v": "2"}

    # cross-check: the per-sample path stores the identical end state
    store2 = RecordStore(spark, str(tmp_path / "s2"))
    pipe2 = SubscriberPipeline(ZenohApiConfig(bucket="b1"), store2,
                               now_us=lambda: 5)
    pipe2.handle_sample("e", b"first", serialize_labels({"v": "1"}))
    pipe2.handle_sample("e", b"second!", serialize_labels({"v": "2"}))
    pipe2.handle_sample("other", b"x")
    rows2 = {(r["entry"], r["ts"]): bytes(r["payload"])
             for r in store2.read().collect()}
    assert rows2 == {(r["entry"], r["ts"]): bytes(r["payload"])
                     for r in store.read().collect()}


def test_handle_samples_skip_rejects_alone(spark, tmp_path):
    """on_error='skip' (reject-and-continue): a guard-rejected sample
    lands in the rejected list with its index and error while the rest
    of the batch still ingests in one write."""
    from reductstore_spark.sources.zenoh import Sample
    store = RecordStore(spark, str(tmp_path / "s"))

    def deny_big(n):
        if n > 2:
            raise RuntimeError(f"too many ingress bytes: {n}")

    pipe = SubscriberPipeline(ZenohApiConfig(bucket="b1"), store,
                              check_ingress=deny_big,
                              now_us=iter(range(1, 100)).__next__)
    out = pipe.handle_samples(
        [Sample("e", b"ok", "t", None, None),
         Sample("e", b"toobig", "t", None, None),
         Sample("f", b"no", "t", None, None)],
        on_error="skip")
    assert out["records"] == 2 and out["bytes"] == 4
    assert out["rejected"] == [{"index": 1, "key_expr": "e",
                                "error": "Storage error: too many ingress bytes: 6"}]
    got = {(r["entry"], bytes(r["payload"]))
           for r in store.read().collect()}
    assert got == {("e", b"ok"), ("f", b"no")}

    with pytest.raises(ValueError, match="on_error"):
        pipe.handle_samples([], on_error="nope")


def test_handle_samples_skip_batch_global_failure_raises(spark, tmp_path):
    """A failing api-request guard (auth/token/limits) is batch-global:
    skip mode must RAISE, not reject every sample individually and
    return a success-shaped dict with records=0 that a caller ignoring
    the rejected list reads as silent total data loss (r9 ADVICE)."""
    from reductstore_spark.sources.zenoh import Sample
    store = RecordStore(spark, str(tmp_path / "s"))

    def deny_all():
        raise RuntimeError("token rejected")

    pipe = SubscriberPipeline(ZenohApiConfig(bucket="b1"), store,
                              check_api_request=deny_all,
                              now_us=iter(range(1, 100)).__next__)
    with pytest.raises(IngestError, match="token rejected"):
        pipe.handle_samples([Sample("e", b"a", "t", None, None)],
                            on_error="skip")
    assert store.read().count() == 0
