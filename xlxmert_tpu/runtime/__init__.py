"""Native (C++) host runtime: built on demand, always with a Python
fallback. See tokenizer.cpp / fast_tokenizer.py."""
