from . import hash_encoding, mlp  # noqa: F401
