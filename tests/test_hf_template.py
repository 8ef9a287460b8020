"""HF Jinja2 chat-template rendering tests."""

import json

import pytest

from metalchat_tpu.chat.hf_template import (
    TemplateError,
    load_chat_template,
    render_chat_template,
)

CHATML = (
    "{% for message in messages %}"
    "{{ '<|im_start|>' + message['role'] + '\n' + message['content'] + '<|im_end|>' + '\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
)

LLAMA3ISH = (
    "{{ bos_token }}{% for m in messages %}"
    "{{ '<|start_header_id|>' + m['role'] + '<|end_header_id|>\n\n' + m['content'] | trim + '<|eot_id|>' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|start_header_id|>assistant<|end_header_id|>\n\n' }}{% endif %}"
)

MSGS = [
    {"role": "system", "content": "Be brief."},
    {"role": "user", "content": "Hi!"},
]


def test_chatml_render():
    out = render_chat_template(CHATML, MSGS)
    assert out == (
        "<|im_start|>system\nBe brief.<|im_end|>\n"
        "<|im_start|>user\nHi!<|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    no_gen = render_chat_template(CHATML, MSGS, add_generation_prompt=False)
    assert not no_gen.endswith("assistant\n")


def test_llama3ish_with_bos():
    out = render_chat_template(LLAMA3ISH, MSGS, bos_token="<|begin_of_text|>")
    assert out.startswith("<|begin_of_text|><|start_header_id|>system")
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_tools_and_tojson():
    tpl = (
        "{% if tools %}{{ tools | tojson }}{% endif %}"
        "{% for m in messages %}{{ m['content'] }}{% endfor %}"
    )
    tools = [{"name": "multiply", "parameters": {"type": "object"}}]
    out = render_chat_template(tpl, [{"role": "user", "content": "x"}], tools=tools)
    assert json.loads(out[:-1]) == tools


def test_raise_exception():
    tpl = "{{ raise_exception('unsupported role') }}"
    with pytest.raises(TemplateError, match="unsupported role"):
        render_chat_template(tpl, MSGS)


def test_matches_transformers_oracle():
    """Exact parity with transformers' renderer on the same template."""
    transformers = pytest.importorskip("transformers")
    from transformers.utils.chat_template_utils import render_jinja_template

    want, _ = render_jinja_template(
        conversations=[list(MSGS)], chat_template=CHATML,
        add_generation_prompt=True, tools=None, documents=None,
    )
    got = render_chat_template(CHATML, MSGS)
    assert got == want[0]


def test_load_chat_template_forms(tmp_path):
    assert load_chat_template(tmp_path) is None
    cfg = tmp_path / "tokenizer_config.json"
    cfg.write_text(json.dumps({"chat_template": CHATML}))
    assert load_chat_template(tmp_path) == CHATML
    cfg.write_text(json.dumps({"chat_template": [
        {"name": "tool_use", "template": "T"},
        {"name": "default", "template": "D"},
    ]}))
    assert load_chat_template(tmp_path) == "D"
    cfg.write_text(json.dumps({}))
    assert load_chat_template(tmp_path) is None
