"""Deterministic judge stand-in for --judge tests (messages -> dict literal,
the reply shape ast.literal_eval'd by eval/judges.parse_judge_reply)."""


def chat(messages):
    assert isinstance(messages, list) and messages[0]["role"] == "system"
    return "{'pred': 'yes', 'score': 4}"
