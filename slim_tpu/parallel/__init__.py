from .mesh import make_mesh, default_mesh_shape
from .dist import sharded_learn_step, distributed_learn, sharded_predict

__all__ = ["make_mesh", "default_mesh_shape", "sharded_learn_step",
           "distributed_learn", "sharded_predict"]
