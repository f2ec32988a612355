from .raycast import render, render_jit, render_vrc, render_test  # noqa: F401
from .point_splat import render_points  # noqa: F401
