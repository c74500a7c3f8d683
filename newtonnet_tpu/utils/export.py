'''AOT serving export: the inference step compiled to a portable artifact.

TPU-native serving story (SURVEY.md section 1, layer L5): `jax.export`
serializes the traced-and-lowered inference computation -- parameters baked
in as constants -- into one self-contained StableHLO artifact. A serving
process replays it with jax alone: no model source, no checkpoint loading,
no retracing, and a stable versioned format (StableHLO forward
compatibility) that survives framework upgrades. The reference has no
equivalent; its serving path re-runs the eager torch module every call
(/root/reference/newtonnet/utils/ase_interface.py:52-81).

Artifact layout (.npz):
    header  -- one JSON string: format/version, padded shapes, dtype,
               output property names, lowering platforms, model config.
    blob    -- the serialized jax.export Exported (uint8).

The computation is exported at a fixed (batch_size, n_pad) shape -- the
same static-shape discipline the rest of the framework runs on -- with
every requested output head (including derivative heads: gradient_force /
hessian / stress are traced jax.grad compositions and export like any
other op). Export for a platform you are not running on is supported
(platforms=['cpu', 'tpu']): XLA cross-lowers, so a CPU build box can emit
TPU serving artifacts.
'''
import json

import numpy as np

FORMAT = 'newtonnet-tpu-serving'
VERSION = 1


def _round_up(x, m=8):
    return max(m, ((x + m - 1) // m) * m)


def export_inference(model, params, n_atoms, batch_size=1, properties=None,
                     dtype='float32', matmul_precision='highest',
                     platforms=None, periodic=None):
    '''Lower + serialize the inference step for serving.

    Args:
        model, params: a NewtonNet (or compatible init/apply model) and its
            trained parameters. Parameters are captured as constants.
        n_atoms: maximum atom count the artifact serves (padded up to a
            multiple of 8, like the bucketed calculator).
        batch_size: systems per call.
        properties: model output names to emit (default: the model's
            output_properties). Derivative heads must already be in the
            model's output_properties.
        dtype: position/cell input dtype ('float32' / 'float64').
        matmul_precision: MXU pass precision baked into the artifact
            ('highest' keeps MD-grade force consistency, see md/driver.py).
        platforms: lowering platforms, e.g. ['cpu', 'tpu']. Default: the
            current jax backend only.
        periodic: True/False statically resolves a charge-head model's
            ewald_mode='auto' to the single matching Ewald branch before
            lowering (models/output.py with_ewald_mode) -- an AOT artifact
            serves one deployment, which is all-periodic or all-aperiodic
            in practice. None keeps the model's own mode (an 'auto' model
            bakes BOTH branches and dispatches per call).

    Returns:
        (header dict, artifact bytes blob) -- use save_serving_artifact to
        write the .npz file.
    '''
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from newtonnet_tpu.layers.precision import get_precision_by_string

    if periodic is not None and hasattr(model, 'with_ewald_mode'):
        model = model.with_ewald_mode('periodic' if periodic
                                      else 'aperiodic')
    if (getattr(model, 'newton3', False)
            or getattr(model, 'newton3_compact', False)
            or getattr(model, 'inverse_lists', False)
            or getattr(model, 'reverse_lists', False)):
        # an AOT artifact must be self-contained: the fast list formats
        # need host-built colorings per structure, which a serialized
        # StableHLO program cannot run. Parameters are layout-portable
        # (every list layout creates the same tree), so serve through
        # the plain in-jit neighborlist build instead. newton3-family
        # k_max is the HALF-list capacity; the full list needs the
        # build capacity (2k+8, the convention of data/prelists.py).
        from newtonnet_tpu.models import NewtonNet
        cfg = model.config_dict()
        if cfg.get('newton3') or cfg.get('newton3_compact'):
            cfg['k_max'] = 2 * cfg['k_max'] + 8
        for key in ('newton3', 'newton3_compact', 'inverse_lists',
                    'reverse_lists'):
            cfg[key] = False
        model = NewtonNet(param_dtype=model.param_dtype, **cfg)
    props = list(properties or model.output_properties)
    missing = [p for p in props if p not in model.output_properties]
    if missing:
        raise ValueError(
            f'model has no output head(s) {missing}; rebuild the model '
            f'with output_properties covering them before exporting')
    np_dtype = get_precision_by_string(dtype)
    n_pad = _round_up(int(n_atoms))
    B = int(batch_size)
    # device-resident params in the serving dtype: checkpoint loads hand
    # back numpy leaves, which cannot be fancy-indexed by tracers
    params = jax.tree.map(
        lambda x: jnp.asarray(x, np_dtype)
        if np.issubdtype(np.asarray(x).dtype, np.floating)
        else jnp.asarray(x), params)

    def infer(z, pos, cell):
        with jax.default_matmul_precision(matmul_precision):
            out = model.apply(params, z, pos, cell)
        return {k: out[k] for k in props}

    args = (jax.ShapeDtypeStruct((B, n_pad), np.int32),
            jax.ShapeDtypeStruct((B, n_pad, 3), np_dtype),
            jax.ShapeDtypeStruct((B, 3, 3), np_dtype))
    kwargs = {}
    if platforms is not None:
        kwargs['platforms'] = [str(p) for p in platforms]
    exported = jax_export.export(jax.jit(infer), **kwargs)(*args)

    header = {
        'format': FORMAT,
        'version': VERSION,
        'batch_size': B,
        'n_pad': n_pad,
        'dtype': np.dtype(np_dtype).name,
        'properties': props,
        'platforms': list(exported.platforms),
        'matmul_precision': matmul_precision,
        'model_config': _jsonable(model.config_dict()),
    }
    return header, exported.serialize()


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    return obj


def save_serving_artifact(path, header, blob):
    '''Write an export_inference result to one .npz artifact file.'''
    np.savez(path, header=np.asarray(json.dumps(header)),
             blob=np.frombuffer(blob, np.uint8))


class ServedModel:
    '''Run a serving artifact: load once, call per system/batch.

    No model code is needed -- the artifact replays its baked-in
    computation at the exported static shape. Inputs are padded here
    exactly as the exporter padded them; outputs come back unpadded.

    Args:
        path: artifact file written by save_serving_artifact.
    '''

    def __init__(self, path):
        from jax import export as jax_export
        with np.load(path) as f:
            self.header = json.loads(str(f['header'])) \
                if f['header'].shape == () else json.loads(f['header'][()])
            blob = f['blob'].tobytes()
        if self.header.get('format') != FORMAT:
            raise ValueError(f'{path}: not a {FORMAT} artifact')
        if self.header.get('version', 0) > VERSION:
            raise ValueError(
                f'{path}: artifact version {self.header["version"]} is '
                f'newer than this loader ({VERSION})')
        self._exported = jax_export.deserialize(blob)
        self.properties = list(self.header['properties'])
        self.n_pad = int(self.header['n_pad'])
        self.batch_size = int(self.header['batch_size'])
        self.dtype = np.dtype(self.header['dtype'])
        if self.dtype == np.float64:
            # the artifact's input signature is f64; without x64 a fresh
            # process canonicalizes inputs to f32 and Exported.call raises
            # a dtype mismatch. Enabling here keeps --dtype float64
            # artifacts servable end to end.
            import jax
            jax.config.update('jax_enable_x64', True)

    def call_raw(self, z, pos, cell):
        '''Run at the exported padded shapes; returns the padded outputs.'''
        import jax
        backend = jax.default_backend()
        # jax.export platform names differ from backend names on GPU:
        # backend 'gpu' corresponds to lowering platforms 'cuda'/'rocm'.
        aliases = {'gpu': {'gpu', 'cuda', 'rocm'}}.get(backend, {backend})
        if not aliases & set(self.header['platforms']):
            raise ValueError(
                f'artifact was lowered for {self.header["platforms"]}, '
                f'current backend is {backend}; re-export with '
                f'platforms=[..., "{backend}"]')
        return self._exported.call(z, pos, cell)

    def __call__(self, numbers, positions, cell=None):
        '''Evaluate one system (or a list of up to batch_size systems).

        Returns a dict keyed by the exported property names with padding
        stripped; for a single system the batch axis is squeezed away.
        '''
        single = not isinstance(numbers, (list, tuple))
        num_list = [numbers] if single else list(numbers)
        pos_list = [positions] if single else list(positions)
        cell_list = ([cell] * len(num_list) if single or cell is None
                     or np.ndim(cell) == 2 else list(cell))
        if len(num_list) > self.batch_size:
            raise ValueError(
                f'{len(num_list)} systems > exported batch_size '
                f'{self.batch_size}')
        if len(pos_list) != len(num_list):
            raise ValueError(
                f'{len(num_list)} number lists but {len(pos_list)} '
                f'position arrays')
        if len(cell_list) != len(num_list):
            raise ValueError(
                f'{len(num_list)} systems but {len(cell_list)} cells; pass '
                f'one 3x3 cell (shared) or exactly one per system')
        counts = [len(n) for n in num_list]
        if max(counts) > self.n_pad:
            raise ValueError(
                f'{max(counts)} atoms > exported capacity {self.n_pad}')
        B, n_pad = self.batch_size, self.n_pad
        z = np.zeros((B, n_pad), np.int32)
        pos = np.zeros((B, n_pad, 3), self.dtype)
        c = np.zeros((B, 3, 3), self.dtype)
        for i, (ni, pi, ci) in enumerate(zip(num_list, pos_list, cell_list)):
            z[i, :counts[i]] = ni
            pos[i, :counts[i]] = pi
            if ci is not None:
                c[i] = ci
        out = {k: np.asarray(v)
               for k, v in self.call_raw(z, pos, c).items()}
        results = []
        for i, n in enumerate(counts):
            r = {}
            for k, v in out.items():
                if k in ('energy',):
                    r[k] = float(v[i])
                elif k == 'hessian':
                    r[k] = v[i, :n, :, :n, :]
                elif v.ndim >= 2 and v.shape[1] == n_pad:
                    r[k] = v[i, :n]
                else:
                    r[k] = v[i]
            results.append(r)
        return results[0] if single else results
