"""USAGE.md is the library's public surface: execute every ```python
snippet in it, in order, against real testdata — so the guide cannot
drift from the API (round-5 verdict #8).

Placeholder names the prose leaves to the reader (updates_df, out, cp,
src_root, …) are provided by `_provide`; the illustrative store path
"/data/store" is rewritten to a per-test tmp dir.  Everything else runs
verbatim.
"""

import os
import re

import pytest

USAGE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "USAGE.md")
SF_DIR = "/root/testdata/sf0.001"


def _blocks():
    with open(USAGE) as fh:
        return re.findall(r"```python\n(.*?)```", fh.read(), re.S)


def _provide(ns, code, spark, tmp):
    """Define the free names a snippet expects the reader to supply."""
    if "updates_df" in code and "updates_df" not in ns:
        ns["updates_df"] = spark.createDataFrame(
            [("events", "purchase", 0, {"seen": "1"}, [])],
            "bucket string, entry string, ts long, "
            "upsert map<string,string>, remove array<string>")
    if "records_df" in code and "records_df" not in ns:
        ns["records_df"] = ns["store"].read()
    if re.search(r"\bdf\b", code) and "df" not in ns and "store" in ns \
            and not re.search(r"^df\s*=", code, re.M):
        ns["df"] = ns["store"].read()
    if "sf_dir" in code:
        ns["sf_dir"] = SF_DIR
    for name in ("out", "cp", "cp2", "src_root", "dst_root"):
        # re-provide per block (an earlier snippet may have reused the
        # name for its own result, e.g. `out = plan_when(...)`) — but
        # never shadow a name THIS block assigns itself
        if re.search(rf"\b{name}\b", code) \
                and not re.search(rf"^{name}\s*=", code, re.M):
            if name == "src_root":
                # replication reads the store the earlier snippet wrote
                ns[name] = ns["__store_root__"]
            else:
                d = str(tmp / name)
                ns[name] = d


def test_usage_snippets_execute(spark, tmp_path):
    blocks = _blocks()
    assert len(blocks) >= 9  # the guide's current shape; grows freely
    store_root = str(tmp_path / "store")
    ns = {"spark": spark, "__store_root__": store_root}
    for i, code in enumerate(blocks):
        code = code.replace('"/data/store"', repr(store_root))
        _provide(ns, code, spark, tmp_path)
        try:
            exec(compile(code, f"USAGE.md[block {i}]", "exec"), ns)
        finally:
            # availableNow streams terminate on their own; wait so later
            # snippets (and the session fixture) see a quiet bus
            for q in spark.streams.active:
                try:
                    q.awaitTermination(120)
                except Exception:  # noqa: BLE001 — stop below regardless
                    pass
                q.stop()
    # the guide's pipeline actually moved data: store written, queried,
    # replicated
    assert ns["store"].read().count() > 0
    from reductstore_spark.sources.store import RecordStore
    replica = RecordStore(spark, ns["dst_root"])
    reps = replica.read()
    assert reps.where(reps.bucket == "replica").count() > 0
