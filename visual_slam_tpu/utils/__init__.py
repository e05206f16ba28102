from . import dataset, evaluate  # noqa: F401
