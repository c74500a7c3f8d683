from newtonnet_tpu.parallel.mesh import make_mesh
