"""Utilities: tokenizer/detokenizer helpers, checkpoint loading, chat
templates, GGUF parsing — counterpart of the reference's src/utils/."""
