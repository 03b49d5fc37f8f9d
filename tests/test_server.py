"""HTTP query server — POST the reference-shaped query JSON, sync via
the next_cursor loop (server.rs / README.md:200-205 analog)."""

import json
import urllib.request

import pytest

from skar_spark.config import EngineConfig
from skar_spark.engine.encode import encode_documents
from skar_spark.server import serve
from skar_spark.synth import synth_documents

pytestmark = pytest.mark.spark

N_DOCS = 2_000
CFG = EngineConfig(target_partition_rows=500, max_row_group_size=250,
                   salt_threshold_rows=400)


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("srv") / "out")
    docs = synth_documents(spark, N_DOCS, partitions=4)
    encode_documents(spark, docs, out, CFG, n_rows=N_DOCS)
    srv = serve(spark, out)
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(base, payload):
    req = urllib.request.Request(
        f"{base}/query", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_query_sync_loop_over_http(server):
    """The client sync loop: POST, follow next_cursor, cover the table
    exactly once."""
    urls, cursor, hops = [], 0, 0
    while cursor is not None:
        code, res = _post(server, {
            "cursor": cursor, "max_rows": 400, "page_files": 1,
            "field_selection": ["url"],
        })
        assert code == 200
        urls.extend(r["url"] for r in res["rows"])
        cursor = res["next_cursor"]
        hops += 1
        assert hops < 40
    assert hops > 1
    assert len(urls) == N_DOCS and len(set(urls)) == N_DOCS


def test_selection_over_http(server):
    code, res = _post(server, {
        "selections": [{"langs": ["de"]}],
        "field_selection": ["url", "lang"],
    })
    assert code == 200
    assert res["rows"] and all(r["lang"] == "de" for r in res["rows"])


def test_height_endpoint_and_errors(server):
    with urllib.request.urlopen(f"{server}/height", timeout=30) as r:
        assert json.loads(r.read())["archive_height"] > 0
    code, res = _post(server, ["not", "a", "dict"])
    assert code == 400 and "error" in res
    code, res = _post(server, {"from_ts": "not-a-timestamp"})
    assert code == 400 and "error" in res
