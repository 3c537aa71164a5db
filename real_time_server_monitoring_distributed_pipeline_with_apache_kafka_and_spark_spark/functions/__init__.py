from .numeric import display_round  # noqa: F401
