from . import hashing, pgn, text, vectors  # noqa: F401
