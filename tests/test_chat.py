"""Chat layer tests: templating, scanners, tool calling, interpreter loop
(reference: test_command.cc, test_interpreter.cc — here weight-free)."""

import numpy as np
import pytest

import jax.numpy as jnp

from metalchat_tpu.chat import (
    ChatSession,
    Command,
    CommandScanner,
    CompositeScanner,
    Interpreter,
    LimitScanner,
    StopTokenScanner,
    render_template,
)
from metalchat_tpu.chat.interpreter import ChatTemplates
from metalchat_tpu.chat.tools import PYTHON_TAG
from metalchat_tpu.models import init_random_params
from metalchat_tpu.sampling import SamplerConfig
from metalchat_tpu.text.bpe import BytePairEncoder
from metalchat_tpu.text.tokenizer import TokenKind

from test_model import TINY_LLAMA


# ------------------------------------------------------------- templating


def test_render_variables_and_dots():
    out = render_template("Hello {{name}}, {{a.b}}!", {"name": "world", "a": {"b": 42}})
    assert out == "Hello world, 42!"
    assert render_template("{{missing}}", {}) == ""


def test_render_sections():
    t = "{{#items}}[{{.}}]{{/items}}{{^items}}none{{/items}}"
    assert render_template(t, {"items": [1, 2, 3]}) == "[1][2][3]"
    assert render_template(t, {"items": []}) == "none"
    assert render_template("{{#on}}yes{{/on}}", {"on": True}) == "yes"
    assert render_template("{{! a comment }}x", {}) == "x"
    with pytest.raises(ValueError):
        render_template("{{#open}}...", {"open": True})


# --------------------------------------------------------------- scanners


def test_scanners():
    stop = StopTokenScanner([7, 9])
    assert stop.scan(1) and not stop.scan(9)
    limit = LimitScanner(2)
    assert limit.scan(0) and limit.scan(0) and not limit.scan(0)
    limit.reset()
    assert limit.scan(0)
    combo = CompositeScanner([StopTokenScanner([5]), LimitScanner(3)])
    assert combo.scan(1) and not combo.scan(5)


# ------------------------------------------------------------ tool calling


def _calc_commands():
    multiply = Command(
        name="multiply",
        description="multiply two integers",
        parameters={
            "type": "object",
            "properties": {"a": {"type": "integer"}, "b": {"type": "integer"}},
            "required": ["a", "b"],
        },
        handler=lambda a, b: a * b,
    )
    return CommandScanner([multiply])


def test_command_parse_and_execute():
    scanner = _calc_commands()
    text = f'I will compute.{PYTHON_TAG}{{"name": "multiply", "parameters": {{"a": 12135, "b": 9312}}}}'
    statement = scanner.parse(text)
    assert statement is not None and statement.name == "multiply"
    assert statement["a"] == 12135
    assert scanner.execute(statement) == 12135 * 9312


def test_command_validation():
    scanner = _calc_commands()
    bad = scanner.parse(f'{PYTHON_TAG}{{"name": "multiply", "parameters": {{"a": "x"}}}}')
    with pytest.raises(Exception):
        scanner.execute(bad)
    assert scanner.parse("no call here") is None
    assert scanner.parse(f"{PYTHON_TAG}{{not json}}") is None
    # describe_all feeds the {{metalchat.commands}} builtin
    assert "multiply" in scanner.describe_all()


# ------------------------------------------------------------- interpreter


def _byte_tokenizer():
    """256 byte tokens + llama3-style specials (deterministic, no merges)."""
    vocab = {bytes([b]): b for b in range(256)}
    tok = BytePairEncoder(vocab, split_pattern=None)
    for i, name in enumerate(
        ["<|begin_of_text|>", "<|end_of_text|>", "<|start_header_id|>",
         "<|end_header_id|>", "<|eot_id|>", "<|python_tag|>"]
    ):
        kind = {
            "<|begin_of_text|>": TokenKind.BEGIN_TEXT,
            "<|end_of_text|>": TokenKind.END_TEXT,
            "<|start_header_id|>": TokenKind.BEGIN_HEADER,
            "<|end_header_id|>": TokenKind.END_HEADER,
            "<|eot_id|>": TokenKind.END_TURN,
            "<|python_tag|>": TokenKind.IPYTHON,
        }[name]
        tok.add_special(name, 256 + i, kind)
    return tok


@pytest.fixture(scope="module")
def session_parts():
    cfg = TINY_LLAMA.replace(vocab_size=262, max_seq_len=256)
    params = init_random_params(cfg, seed=77, dtype=jnp.float32)
    return cfg, params, _byte_tokenizer()


def test_interpreter_round_trip(session_parts):
    cfg, params, tok = session_parts
    session = Interpreter(
        params, cfg, tok,
        sampler=SamplerConfig.greedy(),
        max_reply_tokens=8,
        max_seq_len=256,
    )
    assert session.stop_ids  # derived from tokenizer special kinds
    session.write("hi there", role="user")
    reply = session.read()
    assert isinstance(reply, str)
    pos_after_first = session.pos
    assert pos_after_first > 0

    # Second turn reuses the cache; pos strictly grows.
    session.write("again", role="user")
    reply2 = session.read()
    assert session.pos > pos_after_first

    # Determinism: fresh session with same inputs produces the same replies.
    session_b = Interpreter(
        params, cfg, tok, sampler=SamplerConfig.greedy(),
        max_reply_tokens=8, max_seq_len=256,
    )
    session_b.write("hi there", role="user")
    assert session_b.read() == reply


def test_interpreter_template_variables(session_parts):
    cfg, params, tok = session_parts
    templates = ChatTemplates(
        begin_text="<|begin_of_text|>",
        header="<|start_header_id|>{{role}}<|end_header_id|>",
        message="[{{role}}|{{persona}}] {{content}}<|eot_id|>",
    )
    session = Interpreter(params, cfg, tok, templates=templates,
                          sampler=SamplerConfig.greedy(), max_seq_len=256)
    session.declare("persona", "pirate")
    session.write("ahoy")
    text = tok.decode(session._buffer)
    assert "[user|pirate] ahoy" in text


def test_exec_tool_loop(session_parts, monkeypatch):
    """exec(): model 'emits' a tool call, result is fed back, final answer out."""
    cfg, params, tok = session_parts
    session = Interpreter(params, cfg, tok, sampler=SamplerConfig.greedy(),
                          max_seq_len=256)
    session.register_command(Command(
        name="multiply", description="multiply",
        parameters={"type": "object",
                    "properties": {"a": {"type": "integer"}, "b": {"type": "integer"}},
                    "required": ["a", "b"]},
        handler=lambda a, b: a * b,
    ))
    replies = iter([
        f'{PYTHON_TAG}{{"name": "multiply", "parameters": {{"a": 6, "b": 7}}}}',
        "the answer is 42",
    ])
    seen = []
    monkeypatch.setattr(session, "read", lambda: next(replies))
    real_write = session.write
    monkeypatch.setattr(
        session, "write", lambda content, role="user": seen.append((role, content)) or real_write(content, role)
    )
    out = session.exec("what is 6*7?")
    assert out == "the answer is 42"
    assert ("ipython", "42") in seen  # tool result written back as ipython


def test_context_exhaustion_raises(session_parts):
    cfg, params, tok = session_parts
    session = Interpreter(params, cfg, tok, sampler=SamplerConfig.greedy(),
                          max_seq_len=32)
    session.write("x" * 200, role="user")  # 200+ byte tokens >> 32 window
    with pytest.raises(RuntimeError, match="context window"):
        session.read()
