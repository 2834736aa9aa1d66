from .extract import extract_mesh  # noqa: F401
from .writer import save_mesh  # noqa: F401
