#!/usr/bin/env python
'''Measure the reference's training-step throughput (edges/s) on CPU torch.

The reference repo itself cannot run in this environment (torch_geometric,
ase and les are not installed, and there is no CUDA device), so this tool
times a faithful plain-torch restatement of its hot path -- dynamic radius
graph built inside every forward (newtonnet/layers/representations.py:57-100),
scatter aggregation via index_add (torch_geometric scatter's backend),
3 interaction layers, energy head, forces by autograd double-backward, MSE
losses and an Adam step -- on the same MD17-aspirin batch bench.py uses.

Writes BENCH_BASELINE.json; bench.py reports vs_baseline against it.
Run: python tools/torch_baseline.py
'''
import json
import os
import sys
import time

import numpy as np
import torch

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

BATCH_SIZE = 100
N_STEPS = 10
CUTOFF = 5.0
N_FEATURES = 128
N_BASIS = 20
N_INTERACTIONS = 3
DTYPE = torch.float32  # fp32 (the TPU side also runs fp32)


def load_flat_batch():
    from newtonnet_tpu.data import MolecularInMemoryDataset
    ds = MolecularInMemoryDataset(
        root=os.path.join(HERE, 'data', 'md17_aspirin', 'ccsd_train'))
    z, pos, force, batch_idx, energy = [], [], [], [], []
    for i in range(BATCH_SIZE):
        s = ds[i]
        z.append(s['z'])
        pos.append(s['pos'])
        force.append(s['force'])
        energy.append(s['energy'])
        batch_idx.append(np.full(len(s['z']), i))
    return (torch.tensor(np.concatenate(z)).long(),
            torch.tensor(np.concatenate(pos), dtype=DTYPE),
            torch.tensor(np.concatenate(force), dtype=DTYPE),
            torch.tensor(np.concatenate(batch_idx)).long(),
            torch.tensor(np.array(energy), dtype=DTYPE))


class Interaction(torch.nn.Module):
    '''InteractionNet (ref newtonnet/models/newtonnet.py:165-237).'''

    def __init__(self):
        super().__init__()
        act = torch.nn.SiLU()
        f, b = N_FEATURES, N_BASIS
        self.message_nodepart = torch.nn.Sequential(
            torch.nn.Linear(f, f), act, torch.nn.Linear(f, f))
        self.message_edgepart = torch.nn.Linear(b, f, bias=False)
        self.equiv_message1 = torch.nn.Sequential(
            torch.nn.Linear(f, f, bias=False), act,
            torch.nn.Linear(f, f, bias=False))
        self.equiv_message2 = torch.nn.Sequential(
            torch.nn.Linear(f, f, bias=False), act,
            torch.nn.Linear(f, f, bias=False))
        self.equiv_update = torch.nn.Linear(f, f, bias=False)

    def forward(self, atom_node, force_node, dir_edge, dist_edge, edge_index):
        n = atom_node.shape[0]
        mn = self.message_nodepart(atom_node)
        me = self.message_edgepart(dist_edge)
        message = me * mn[edge_index[0]] * mn[edge_index[1]]
        atom_node = atom_node + torch.zeros_like(atom_node).index_add_(
            0, edge_index[0], message)
        e1 = self.equiv_message1(message).unsqueeze(1) * dir_edge.unsqueeze(2)
        e2 = (self.equiv_message2(message).unsqueeze(1)
              * force_node[edge_index[1]])
        force_node = force_node + torch.zeros_like(force_node).index_add_(
            0, edge_index[0], e1 + e2)
        atom_node = atom_node + torch.sum(
            force_node * self.equiv_update(force_node), dim=1)
        return atom_node, force_node


class RefModel(torch.nn.Module):
    def __init__(self):
        super().__init__()
        act = torch.nn.SiLU()
        f = N_FEATURES
        self.embedding = torch.nn.Embedding(119, f, padding_idx=0)
        self.interactions = torch.nn.ModuleList(
            [Interaction() for _ in range(N_INTERACTIONS)])
        self.energy_head = torch.nn.Sequential(
            torch.nn.Linear(f, f), act, torch.nn.Linear(f, f), act,
            torch.nn.Linear(f, 1))
        freqs = torch.arange(1, N_BASIS + 1, dtype=DTYPE) * torch.pi
        self.register_buffer('freqs', freqs)

    def forward(self, z, pos, batch_idx, n_graphs):
        # dynamic radius graph per forward (ref representations.py:70-98)
        n = pos.shape[0]
        row = torch.arange(n).view(n, 1).expand(n, n)
        col = row.t()
        same = batch_idx[row.reshape(-1)] == batch_idx[col.reshape(-1)]
        notself = row.reshape(-1) != col.reshape(-1)
        ei = torch.stack([row.reshape(-1), col.reshape(-1)])[:, same & notself]
        disp = pos[ei[0]] - pos[ei[1]]
        mask = disp.norm(dim=1) < CUTOFF
        ei, disp = ei[:, mask], disp[mask]
        norm = disp.norm(dim=-1, keepdim=True)
        dir_edge = disp / norm
        dist = norm / CUTOFF
        p = 9
        env = (1 - 0.5 * (p + 1) * (p + 2) * dist.pow(p)
               + p * (p + 2) * dist.pow(p + 1)
               - 0.5 * p * (p + 1) * dist.pow(p + 2))
        rbf = env * torch.sin(self.freqs * dist) / dist

        atom_node = self.embedding(z)
        force_node = torch.zeros(n, 3, N_FEATURES, dtype=pos.dtype)
        for layer in self.interactions:
            atom_node, force_node = layer(atom_node, force_node, dir_edge,
                                          rbf, ei)
        e_atom = self.energy_head(atom_node)
        energy = torch.zeros(n_graphs, dtype=pos.dtype).index_add_(
            0, batch_idx, e_atom.squeeze(-1))
        return energy, ei.shape[1]


def main():
    torch.set_num_threads(os.cpu_count())
    z, pos, force_ref, batch_idx, energy_ref = load_flat_batch()
    model = RefModel().to(DTYPE)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    def step():
        opt.zero_grad()
        pos_g = pos.clone().requires_grad_(True)
        energy, n_edges = model(z, pos_g, batch_idx, BATCH_SIZE)
        (pos_grad,) = torch.autograd.grad(
            energy.sum(), pos_g, create_graph=True)
        force = -pos_grad
        loss = (torch.nn.functional.mse_loss(energy, energy_ref)
                + 50.0 * torch.nn.functional.mse_loss(force, force_ref))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        return n_edges

    n_edges = step()  # warmup
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        step()
    dt = (time.perf_counter() - t0) / N_STEPS
    edges_per_s = n_edges / dt

    out = {
        'edges_per_s': edges_per_s,
        'step_seconds': dt,
        'n_edges': n_edges,
        'device': 'cpu-torch',
        'note': ('plain-torch restatement of the reference hot path '
                 '(reference deps unavailable: no PyG/ase/les, no GPU); '
                 f'batch={BATCH_SIZE} MD17 aspirin frames, fp32, '
                 f'{os.cpu_count()} threads'),
    }
    with open(os.path.join(HERE, 'BENCH_BASELINE.json'), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
