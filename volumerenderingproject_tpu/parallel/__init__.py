from .mesh import initialize_distributed, make_mesh  # noqa: F401
from .render_dist import render_vrc_sharded, render_vrc_sharded_jit  # noqa: F401
