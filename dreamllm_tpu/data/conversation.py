"""Conversation templates (vicuna v1.1, llama-2) for SFT data and eval
prompts — reference omni/conversation/conversation.py:16-147.

Rendered as *segments* rather than one flat string so the builder can mask
labels per-turn without re-tokenizing prefixes (the reference recovers turn
boundaries by counting tokens with legacy-SPM offset hacks,
builder_dreamllm.py:358-433 — we keep explicit structure instead and the
offsets disappear)."""

from __future__ import annotations

import dataclasses
from typing import Sequence

from dreamllm_tpu.data.dataset_types import Message


@dataclasses.dataclass(frozen=True)
class ConvTemplate:
    name: str
    system: str
    roles: tuple[str, str]          # (user tag, assistant tag)
    sep_style: str                  # "add_colon_two" | "llama2" | "single"
    seps: tuple[str, str]


VICUNA_V11 = ConvTemplate(
    name="vicuna_v1.1",
    system=(
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the user's questions."
    ),
    roles=("USER", "ASSISTANT"),
    sep_style="add_colon_two",
    seps=(" ", "</s>"),
)

LLAMA2 = ConvTemplate(
    name="llama2",
    system="",
    roles=("[INST]", "[/INST]"),
    sep_style="llama2",
    seps=(" ", " </s>"),
)

# v0-style single-separator template (reference conv_v1 / simple_conv,
# omni/utils/conversation.py:201-228,312-320): every turn ends with the SAME
# separator ("###"), which is NOT the EOS token — generation must stop on the
# decoded stop string (generation/stopping.py), exactly the case the
# reference handles with KeywordsStoppingCriteria.
VICUNA_V0 = ConvTemplate(
    name="vicuna_v0",
    system=(
        "A chat between a curious human and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the human's questions."
    ),
    roles=("Human", "Assistant"),
    sep_style="single",
    seps=("###", "###"),
)

TEMPLATES = {t.name: t for t in (VICUNA_V11, LLAMA2, VICUNA_V0)}


@dataclasses.dataclass
class Segment:
    text: str
    learnable: bool     # True → tokens contribute to the LM loss


def render_conversation(
    template: ConvTemplate,
    messages: Sequence[Message],
    system: str | None = None,
) -> list[Segment]:
    """Flatten a dialog into (text, learnable) segments.

    Only assistant replies (and their closing separator/EOS) are learnable —
    the reference's turn-masking semantics (builder_dreamllm.py:404-424)."""
    sys_text = system if system is not None else template.system
    segs: list[Segment] = []
    if template.sep_style == "add_colon_two":
        if sys_text:
            segs.append(Segment(sys_text + template.seps[0], False))
        for m in messages:
            if m.role == "system":
                continue
            if m.role == "user":
                segs.append(Segment(f"{template.roles[0]}: {m.content}{template.seps[0]}", False))
            else:
                segs.append(Segment(f"{template.roles[1]}: ", False))
                segs.append(Segment(m.content + template.seps[1], True))
    elif template.sep_style == "single":
        # reference SeparatorStyle.SINGLE (conversation.py:50-59):
        # system + sep, then "Role: msg" + sep per turn
        segs.append(Segment(sys_text + template.seps[0], False))
        for m in messages:
            if m.role == "system":
                continue
            if m.role == "user":
                segs.append(Segment(f"{template.roles[0]}: {m.content}{template.seps[0]}", False))
            else:
                segs.append(Segment(f"{template.roles[1]}: ", False))
                segs.append(Segment(m.content + template.seps[1], True))
    elif template.sep_style == "llama2":
        # Exact string parity with the reference's default_chat_template
        # (tokenization_dreamllm.py:400-448): each exchange renders as
        # ``<s>[INST] Q [/INST] A </s>`` with the system prompt embedded in
        # the first user turn. The leading <s> of the FIRST turn is omitted
        # here — the builder prepends the bos token id itself.
        first = True
        for m in messages:
            if m.role == "system":
                continue
            if m.role == "user":
                prefix = f"<<SYS>>\n{sys_text}\n<</SYS>>\n\n" if (first and sys_text) else ""
                bos = "" if first else "<s>"
                segs.append(
                    Segment(f"{bos}{template.roles[0]} {prefix}{m.content.strip()} {template.roles[1]}", False)
                )
                first = False
            else:
                # template.seps[1] (" </s>") rather than a hardcoded literal,
                # so llama2-style templates with different separators render
                # as configured
                segs.append(Segment(f" {m.content.strip()}{template.seps[1]}", True))
    else:
        raise ValueError(template.sep_style)
    return segs


def render_prompt(template: ConvTemplate, messages: Sequence[Message],
                  system: str | None = None) -> str:
    """Inference-time prompt: all turns + a trailing assistant header."""
    segs = render_conversation(template, messages, system)
    out = "".join(s.text for s in segs)
    if template.sep_style in ("add_colon_two", "single"):
        out += f"{template.roles[1]}:"
    return out
