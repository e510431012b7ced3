from sos_rt_tpu.parallel.mesh import (  # noqa: F401
    broadcast_scene,
    make_mesh,
    solve_batch,
)
