"""Chat serving layer: templates, token scanners, tool calling, interpreter."""

from metalchat_tpu.chat.template import render_template  # noqa: F401
from metalchat_tpu.chat.scanners import (  # noqa: F401
    CompositeScanner,
    LimitScanner,
    StopTokenScanner,
)
from metalchat_tpu.chat.tools import Command, CommandScanner, CommandStatement  # noqa: F401
from metalchat_tpu.chat.interpreter import ChatSession, Interpreter  # noqa: F401
from metalchat_tpu.chat.hf_template import (  # noqa: F401,E402
    load_chat_template,
    render_chat_template,
)
