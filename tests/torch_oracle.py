'''Plain-torch numerical oracle of the reference NewtonNet forward pass.

The reference package itself cannot be imported in this environment (its
modules import torch_geometric and `les` at import time, neither of which is
installed), so this oracle re-states the reference *equations* in plain
torch -- dynamic edge lists, scatter via index_add_, autograd forces --
with every step cited to the reference source under /root/reference.
It exists only for tests: per-layer and end-to-end allclose parity of the
TPU implementation (SURVEY.md section 4: "the reference's role is as a
numerical oracle").

It consumes the flax parameter pytree directly (kernels are transposed to
torch's (out, in) layout on the fly).
'''
import numpy as np
import torch


def _linear(x, p):
    w = torch.as_tensor(np.asarray(p['kernel']), dtype=x.dtype)
    y = x @ w
    if 'bias' in p:
        y = y + torch.as_tensor(np.asarray(p['bias']), dtype=x.dtype)
    return y


def _mlp(x, p, act, n_layers):
    for i in range(n_layers):
        if i > 0:
            x = act(x)
        x = _linear(x, p[f'TorchLinear_{i}'])
    return x


def radius_graph(pos, cell, batch, r):
    '''Reference RadiusGraph.forward (representations.py:57-100), batched path.'''
    edges = []
    for b in torch.unique(batch):
        nodes = (batch == b).nonzero().flatten()
        row, col = torch.meshgrid(nodes, nodes, indexing='ij')
        edges.append(torch.stack([row.flatten(), col.flatten()], dim=0))
    edge_index = torch.cat(edges, dim=1)
    edge_index = edge_index[:, edge_index[0] != edge_index[1]]  # ref :82

    dist = pos[edge_index[0]] - pos[edge_index[1]]  # ref :85
    if not (cell == 0).all():  # ref :86
        cell_e = cell[batch][edge_index[0]]  # ref :88,91
        scaled = torch.linalg.solve(cell_e.transpose(1, 2), dist)  # ref :92
        dist = dist - torch.bmm(
            cell_e, torch.round(scaled).unsqueeze(-1)).squeeze(-1)  # ref :93

    mask = dist.norm(dim=1) < r  # ref :96
    return edge_index[:, mask], dist[mask]


def edge_embedding(pos, cell, batch, r, n_basis):
    '''Reference EdgeEmbedding.forward (representations.py:20-43).'''
    edge_index, disp = radius_graph(pos, cell, batch, r)
    norm = disp.norm(dim=-1, keepdim=True)  # ScaledNorm, ref :129-131
    dir_edge = disp / norm
    dist = norm / r
    p = 9  # PolynomialCutoff(p=9), ref :17,166-169
    envelope = (1 - 0.5 * (p + 1) * (p + 2) * dist.pow(p)
                + p * (p + 2) * dist.pow(p + 1)
                - 0.5 * p * (p + 1) * dist.pow(p + 2))
    freqs = torch.arange(1, n_basis + 1, dtype=dist.dtype) * torch.pi
    bessel = torch.sin(freqs * dist) / dist  # ref :233
    return envelope * bessel, dir_edge, edge_index


def scatter_sum(src, index, dim_size):
    out = torch.zeros((dim_size,) + src.shape[1:], dtype=src.dtype)
    return out.index_add_(0, index, src)


def interaction(atom_node, force_node, dir_edge, dist_edge, edge_index, p,
                act, layer_norm_p=None):
    '''Reference InteractionNet.forward (newtonnet.py:207-237).'''
    n = atom_node.shape[0]
    message_nodepart = _mlp(atom_node, p['message_nodepart'], act, 2)  # :209
    message_edgepart = _linear(dist_edge, p['message_edgepart'])  # :210
    message = (message_edgepart * message_nodepart[edge_index[0]]
               * message_nodepart[edge_index[1]])  # :211

    atom_node = atom_node + scatter_sum(message, edge_index[0], n)  # :213-215

    equiv1 = (_mlp(message, p['equiv_message1'], act, 2).unsqueeze(1)
              * dir_edge.unsqueeze(2))  # :218-220
    equiv2 = (_mlp(message, p['equiv_message2'], act, 2).unsqueeze(1)
              * force_node[edge_index[1]])  # :222-224
    force_node = force_node + scatter_sum(
        equiv1 + equiv2, edge_index[0], n)  # :226-227

    atom_node = atom_node + torch.sum(
        force_node * _linear(force_node, p['equiv_update']), dim=1)  # :230-231

    if layer_norm_p is not None:
        w = torch.as_tensor(np.asarray(layer_norm_p['scale']),
                            dtype=atom_node.dtype)
        b = torch.as_tensor(np.asarray(layer_norm_p['bias']),
                            dtype=atom_node.dtype)
        atom_node = torch.nn.functional.layer_norm(
            atom_node, atom_node.shape[-1:], w, b, eps=1e-5)  # :234-235
    return atom_node, force_node


def scale_shift(output, z, p):
    '''Reference ScaleShift.forward (scalers.py:47-59).'''
    if 'scale' in p:
        scale = torch.as_tensor(np.asarray(p['scale']), dtype=output.dtype)
        output = output * scale[z]
    if 'shift' in p:
        shift = torch.as_tensor(np.asarray(p['shift']), dtype=output.dtype)
        output = output + shift[z]
    return output


def forward(flax_params, z, pos, cell, batch, cutoff=5.0, n_basis=20,
            n_interactions=3, output_properties=('energy', 'gradient_force'),
            dtype=torch.float64):
    '''Reference NewtonNet.forward (newtonnet.py:74-104) end to end.

    Args:
        flax_params: the flax param pytree from NewtonNet.init.
        z: (n,) int atomic numbers (flat, PyG-style).
        pos: (n, 3), cell: (g, 3, 3), batch: (n,) graph ids.

    Returns dict with per-property torch tensors (energy aggregated per
    graph; no les long-range term -- Ewald parity is tested separately).
    '''
    p = flax_params['params']
    act = torch.nn.functional.silu
    z = torch.as_tensor(np.asarray(z)).long()
    pos = torch.as_tensor(np.asarray(pos), dtype=dtype)
    cell = torch.as_tensor(np.asarray(cell), dtype=dtype)
    batch = torch.as_tensor(np.asarray(batch)).long()
    n, g = z.shape[0], cell.shape[0]

    needs_dr = any(k in output_properties
                   for k in ('gradient_force', 'virial', 'stress'))

    # EmbeddingNet (newtonnet.py:139-161)
    emb = torch.as_tensor(np.asarray(p['node_embedding']), dtype=dtype)
    atom_node = emb[z]
    force_node = torch.zeros(n, 3, emb.shape[1], dtype=dtype)

    displacement = torch.zeros(g, 3, 3, dtype=dtype)  # ref :146-149
    displacement[:, 0, 0] = displacement[:, 1, 1] = displacement[:, 2, 2] = 1.0
    if needs_dr:
        pos.requires_grad_(True)
        displacement.requires_grad_(True)
    sym = (displacement + displacement.transpose(-1, -2)) / 2  # ref :153
    pos_d = torch.bmm(pos.unsqueeze(1), sym[batch]).squeeze(1)  # ref :154
    cell_d = torch.bmm(cell, sym)  # ref :155

    dist_edge, dir_edge, edge_index = edge_embedding(
        pos_d, cell_d, batch, cutoff, n_basis)

    for i in range(n_interactions):
        pi = p[f'interaction_{i}']
        atom_node, force_node = interaction(
            atom_node, force_node, dir_edge, dist_edge, edge_index, pi, act,
            layer_norm_p=pi.get('layer_norm'))

    out = {'atom_node': atom_node, 'force_node': force_node}
    if 'energy' in output_properties:
        e = _mlp(atom_node, p['energy_head'], act, 3)  # output.py:90-100
        e = scale_shift(e, z, p['scaler_energy'])
        energy = scatter_sum(e, batch, g).reshape(-1)  # output.py:246
        out['energy'] = energy
    if 'charge' in output_properties:
        q = _mlp(atom_node, p['charge_head'], act, 3)  # output.py:192-202
        out['charge'] = scale_shift(q, z, p['scaler_charge'])
    if 'direct_force' in output_properties:
        w = _mlp(atom_node, p['direct_force_head'], act, 3)
        f = (w.unsqueeze(1) * force_node).sum(dim=-1)  # output.py:130-131
        out['direct_force'] = scale_shift(f, z, p['scaler_direct_force'])
    if needs_dr:
        pos_grad, disp_grad = torch.autograd.grad(
            out['energy'], (pos, displacement),
            grad_outputs=torch.ones_like(out['energy']))  # output.py:66-73
        if 'gradient_force' in output_properties:
            out['gradient_force'] = -pos_grad  # output.py:112
        if 'virial' in output_properties:
            out['virial'] = -disp_grad  # output.py:164
        if 'stress' in output_properties:
            out['stress'] = disp_grad / cell.det().view(-1, 1, 1)  # :174-180
    return out
