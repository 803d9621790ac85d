"""MCP stdio server (A9): protocol subset + tool behavior over real pipes.

Drives the server as a subprocess speaking newline-delimited JSON-RPC —
the same way an MCP client launches it — and checks the reference's merge
rules (mcp_server.py:83-140): json -> list of per-page docs, markdown ->
"\n" page join.
"""

import json
import subprocess
import sys

import pytest

from yomitoku_ray.oracle import analyze_html_bytes
from yomitoku_ray.sources.paged import encode_paged_doc

HTML1 = b"<html><body><h1>title one</h1><p>alpha beta gamma.</p></body></html>"
HTML2 = b"<html><body><p>second page text.</p><table><tr><th>k</th><td>v</td></tr></table></body></html>"


@pytest.fixture(scope="module")
def resource_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mcp_resources")
    (d / "single.html").write_bytes(HTML1)
    (d / "doc.ytrp").write_bytes(encode_paged_doc([HTML1, HTML2]))
    return str(d)


class Client:
    def __init__(self, resource_dir):
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "yomitoku_ray.serve.mcp_server"],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            text=True,
            env={"RESOURCE_DIR": resource_dir, "PATH": "/usr/bin:/bin", "PYTHONPATH": "."},
            cwd="/root/repo",
        )
        self.next_id = 0

    def call(self, method, params=None):
        self.next_id += 1
        req = {"jsonrpc": "2.0", "id": self.next_id, "method": method}
        if params is not None:
            req["params"] = params
        self.proc.stdin.write(json.dumps(req) + "\n")
        self.proc.stdin.flush()
        resp = json.loads(self.proc.stdout.readline())
        assert resp["id"] == self.next_id
        return resp

    def tool(self, name, arguments):
        resp = self.call("tools/call", {"name": name, "arguments": arguments})
        return resp["result"]

    def close(self):
        self.proc.stdin.close()
        self.proc.wait(timeout=10)


@pytest.fixture(scope="module")
def client(resource_dir):
    c = Client(resource_dir)
    init = c.call("initialize", {"protocolVersion": "2024-11-05"})
    assert init["result"]["serverInfo"]["name"] == "yomitoku-ray"
    yield c
    c.close()


def test_tools_list(client):
    tools = client.call("tools/list")["result"]["tools"]
    assert {t["name"] for t in tools} == {"process_document", "extract_fields"}


def test_process_single_markdown(client):
    res = client.tool(
        "process_document", {"filename": "single.html", "output_format": "markdown"}
    )
    assert res["isError"] is False
    expect, err = analyze_html_bytes(HTML1, "single.html#page=1")
    assert err is None
    assert res["content"][0]["text"] == expect["markdown"]


def test_process_paged_merges_reference_style(client):
    md = client.tool(
        "process_document", {"filename": "doc.ytrp", "output_format": "markdown"}
    )["content"][0]["text"]
    p1, _ = analyze_html_bytes(HTML1, "doc.ytrp#page=1")
    p2, _ = analyze_html_bytes(HTML2, "doc.ytrp#page=2")
    assert md == p1["markdown"] + "\n" + p2["markdown"]

    js = client.tool(
        "process_document", {"filename": "doc.ytrp", "output_format": "json"}
    )["content"][0]["text"]
    docs = json.loads(js)
    assert isinstance(docs, list) and len(docs) == 2


def test_extract_fields_tool(client):
    res = client.tool(
        "extract_fields",
        {
            "filename": "doc.ytrp",
            "schema": {"fields": [{"name": "key", "description": "k"}]},
        },
    )
    assert res["isError"] is False
    out = json.loads(res["content"][0]["text"])
    assert out[1]["key"] == "v"  # page 2 holds the kv table


def test_missing_file_is_in_band_error(client):
    res = client.tool(
        "process_document", {"filename": "nope.html", "output_format": "markdown"}
    )
    assert res["isError"] is True
    assert "FileNotFoundError" in res["content"][0]["text"]


def test_unknown_method_and_tool(client):
    resp = client.call("no/such/method")
    assert resp["error"]["code"] == -32601
    res = client.call("tools/call", {"name": "bogus", "arguments": {}})
    assert res["error"]["code"] == -32602


def test_resource_dir_required():
    from yomitoku_ray.serve.mcp_server import _resource_dir

    import os

    old = os.environ.pop("RESOURCE_DIR", None)
    try:
        with pytest.raises(ValueError):
            _resource_dir()
    finally:
        if old is not None:
            os.environ["RESOURCE_DIR"] = old
