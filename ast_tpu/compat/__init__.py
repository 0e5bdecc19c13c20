"""torch .pth checkpoint importer (parity testing; torch optional)."""

from ast_tpu.compat.torch_import import *  # noqa: F401,F403
