"""MCP server protocol tests (stdlib JSON-RPC over stdio).

The reference exposes generate as an MCP tool via gradio's mcp_server flag
(ref: multilingual_app.py:320); this build implements the protocol directly
so it is verifiable offline.
"""
import base64
import io
import json

import numpy as np
import pytest

from chatterbox_tpu.serve.mcp import MCPTTSServer, PROTOCOL_VERSION


@pytest.fixture()
def server():
    calls = {}

    def synth(text, voice, seed, **kw):
        calls["last"] = (text, voice, seed, kw)
        return np.linspace(-0.5, 0.5, 2400, dtype=np.float32)

    srv = MCPTTSServer(synth, {"default": object(), "alt": object()},
                       sr=24000)
    srv._calls = calls
    return srv


def rpc(method, params=None, mid=1):
    msg = {"jsonrpc": "2.0", "id": mid, "method": method}
    if params is not None:
        msg["params"] = params
    return msg


class TestProtocol:
    def test_initialize_and_ping(self, server):
        r = server.handle(rpc("initialize",
                              {"protocolVersion": PROTOCOL_VERSION}))
        assert r["id"] == 1
        assert r["result"]["protocolVersion"] == PROTOCOL_VERSION
        assert "tools" in r["result"]["capabilities"]
        assert r["result"]["serverInfo"]["name"] == "chatterbox-tpu"
        assert server.handle(rpc("ping"))["result"] == {}

    def test_notifications_get_no_response(self, server):
        assert server.handle(
            {"jsonrpc": "2.0", "method": "notifications/initialized"}) is None

    def test_tools_list(self, server):
        tools = server.handle(rpc("tools/list"))["result"]["tools"]
        names = {t["name"] for t in tools}
        assert names == {"generate_speech", "list_voices"}
        gen = next(t for t in tools if t["name"] == "generate_speech")
        assert gen["inputSchema"]["required"] == ["text"]

    def test_generate_speech_returns_wav_audio(self, server):
        r = server.handle(rpc("tools/call", {
            "name": "generate_speech",
            "arguments": {"text": "hello", "voice": "alt", "seed": 7,
                          "temperature": 0.7}}))
        content = r["result"]["content"]
        audio = next(c for c in content if c["type"] == "audio")
        assert audio["mimeType"] == "audio/wav"
        wav = base64.b64decode(audio["data"])
        assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
        assert len(wav) == 44 + 2 * 2400
        text = next(c for c in content if c["type"] == "text")
        assert "0.10s" in text["text"]
        assert server._calls["last"] == ("hello", "alt", 7,
                                         {"temperature": 0.7})

    def test_list_voices_tool(self, server):
        r = server.handle(rpc("tools/call", {"name": "list_voices"}))
        assert json.loads(r["result"]["content"][0]["text"]) == \
            ["alt", "default"]

    def test_tool_errors_reported_in_band(self, server):
        r = server.handle(rpc("tools/call", {
            "name": "generate_speech",
            "arguments": {"text": "x", "voice": "nope"}}))
        assert r["result"]["isError"] is True
        assert "nope" in r["result"]["content"][0]["text"]

    def test_unknown_method_is_jsonrpc_error(self, server):
        r = server.handle(rpc("resources/list"))
        assert r["error"]["code"] == -32601


class TestStdioTransport:
    def test_newline_delimited_session(self, server):
        lines = [
            json.dumps(rpc("initialize",
                           {"protocolVersion": PROTOCOL_VERSION}, mid=0)),
            json.dumps({"jsonrpc": "2.0",
                        "method": "notifications/initialized"}),
            "not json at all",
            json.dumps(rpc("tools/call",
                           {"name": "generate_speech",
                            "arguments": {"text": "hi"}}, mid=1)),
        ]
        out = io.StringIO()
        server.serve_stdio(stdin=io.StringIO("\n".join(lines) + "\n"),
                           stdout=out)
        resps = [json.loads(l) for l in out.getvalue().splitlines()]
        assert len(resps) == 3          # notification produced no response
        assert resps[0]["id"] == 0
        assert resps[1]["error"]["code"] == -32700
        audio = next(c for c in resps[2]["result"]["content"]
                     if c["type"] == "audio")
        assert base64.b64decode(audio["data"])[:4] == b"RIFF"
