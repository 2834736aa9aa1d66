from .mesh import make_mesh, sharded_grad_fn  # noqa: F401
