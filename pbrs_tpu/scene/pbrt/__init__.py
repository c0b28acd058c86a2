from . import tokenizer, parser, loader  # noqa: F401
