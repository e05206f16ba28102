from . import (  # noqa: F401
    epipolar,
    lie,
    pnp,
    projection,
    ransac,
    triangulate,
    twoview,
)
