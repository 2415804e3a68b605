"""Kernel-asm LSP server: framing, semantic tokens, definition, hover."""

import io
import json

from zk_evm_tpu.witness import lsp

SRC = """\
// the exp routine
global sys_exp:
    %charge_gas
    PUSH 0x20
    %exp_helper
    JUMP

%macro exp_helper
    DUP1
    @SEGMENT_KERNEL_GENERAL
%endmacro
"""


def _run(messages):
    """Feed framed messages, return the server's replies."""
    body = b""
    for m in messages:
        b = json.dumps(m).encode()
        body += f"Content-Length: {len(b)}\r\n\r\n".encode() + b
    out = io.BytesIO()
    srv = lsp.Server(stdin=io.BytesIO(body), stdout=out)
    srv.serve()
    raw = out.getvalue()
    replies = []
    while raw:
        head, _, rest = raw.partition(b"\r\n\r\n")
        length = int(head.split(b":")[1])
        replies.append(json.loads(rest[:length]))
        raw = rest[length:]
    return replies


def test_initialize_and_tokens():
    uri = "file:///k/exp.asm"
    replies = _run([
        {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
        {"jsonrpc": "2.0", "method": "textDocument/didOpen",
         "params": {"textDocument": {"uri": uri, "text": SRC,
                                     "version": 1}}},
        {"jsonrpc": "2.0", "id": 2,
         "method": "textDocument/semanticTokens/full",
         "params": {"textDocument": {"uri": uri}}},
        {"jsonrpc": "2.0", "id": 3, "method": "shutdown", "params": {}},
        {"jsonrpc": "2.0", "method": "exit"},
    ])
    caps = replies[0]["result"]["capabilities"]
    assert caps["semanticTokensProvider"]["full"] is True
    assert caps["definitionProvider"] is True
    data = replies[1]["result"]["data"]
    assert len(data) % 5 == 0 and len(data) > 0
    # first token: the comment on line 0 col 0
    assert data[0] == 0 and data[1] == 0
    assert data[3] == lsp._TT["comment"]
    kinds = {data[i + 3] for i in range(0, len(data), 5)}
    assert lsp._TT["macro"] in kinds        # %exp_helper call
    assert lsp._TT["number"] in kinds       # 0x20
    assert lsp._TT["keyword"] in kinds      # PUSH / DUP1 opcodes


def test_definition_and_hover_within_document():
    uri = "file:///k/exp.asm"
    # position of `%exp_helper` call (line 4, character 5)
    replies = _run([
        {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
        {"jsonrpc": "2.0", "method": "textDocument/didOpen",
         "params": {"textDocument": {"uri": uri, "text": SRC,
                                     "version": 1}}},
        {"jsonrpc": "2.0", "id": 2, "method": "textDocument/definition",
         "params": {"textDocument": {"uri": uri},
                    "position": {"line": 4, "character": 6}}},
        {"jsonrpc": "2.0", "id": 3, "method": "textDocument/hover",
         "params": {"textDocument": {"uri": uri},
                    "position": {"line": 1, "character": 9}}},
        {"jsonrpc": "2.0", "method": "exit"},
    ])
    # definition of %exp_helper -> the %macro line (7)
    loc = replies[1]["result"]
    assert loc is not None
    assert loc["range"]["start"]["line"] == 7
    hover = replies[2]["result"]
    assert "sys_exp" in hover["contents"]["value"]


def test_kernel_wide_index_resolves_reference_globals():
    idx = lsp.KernelIndex()
    idx.load()
    if not idx.defs:          # reference checkout unavailable
        return
    # a well-known kernel global and macro
    assert "main" in idx.defs or "sys_stop" in idx.defs
    assert any(k.startswith("%") for k in idx.defs)
