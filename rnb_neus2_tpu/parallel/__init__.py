from .mesh import make_mesh  # noqa: F401
from .trainer import ParallelTrainer  # noqa: F401
