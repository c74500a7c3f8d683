'''
newtonnet_tpu: a TPU-native (JAX/XLA/Pallas) framework for Newtonian
message-passing interatomic potentials, with the capabilities of
THGLab/NewtonNet (reference: /root/reference, v2.1.0).

Design stance (not a port):
  * static shapes everywhere -- padded atoms + masks, dense adjacency
    message passing for molecular workloads (pure masked einsums on the MXU,
    no scatter/gather), padded neighbor lists for large periodic systems;
  * forces / stress / Hessians via jax.grad / jax.jacfwd of a pure energy
    function (reference uses torch.autograd.grad, newtonnet/models/output.py:66);
  * functional training loop (optax) with jitted, donated train steps;
  * data parallel + graph (atom-partitioned) parallel over a jax.sharding.Mesh.
'''

__version__ = '0.1.0'
