from .neus_field import NeusField, init_params  # noqa: F401
