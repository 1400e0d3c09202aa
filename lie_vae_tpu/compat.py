"""PyTorch-reference checkpoint import.

A reference user has trained models saved with
``torch.save(model.state_dict())`` (lie_vae/experiments/main.py:122-127,
``save_dir/model.pickle``). This module maps such a state_dict onto a
``LieVAE`` variables tree so the checkpoint can be evaluated, fine-tuned,
or served on TPU without retraining — the migration path for existing
reference deployments.

The key layout is derived from the reference module structure
(nn.Sequential indices in lie_vae/experiments/nets.py:7-91, attribute
names in lie_vae/reparameterize.py:148-215 and lie_vae/decoders.py:9-87,
assembly in lie_vae/experiments/vae.py:40-132) and the tensor-layout
conversions are the ones proven exact by tests/test_torch_parity.py:

- torch ``Conv2d`` weight (O, I, kh, kw)          -> flax HWIO
- torch ``ConvTranspose2d`` weight (I, O, kh, kw) -> spatial flip + HWIO
- torch ``Linear`` weight (out, in)               -> transposed kernel
- BatchNorm weight/bias/running_mean/running_var  -> scale/bias + batch_stats

The import is strict: every reference tensor must land somewhere and every
expected slot must be filled (config mismatches fail loudly instead of
silently producing an untrained submodule). ``num_batches_tracked`` and
constant buffers (``fixed_sigma``, fixed ``item_rep``) are the only keys
ignored.
"""
import numpy as np

import jax
import jax.numpy as jnp


def _np(t):
    """torch tensor | array-like -> numpy array."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _identity(a):
    return a


def _linear(a):
    return np.transpose(a, (1, 0))


def _conv(a):
    return np.transpose(a, (2, 3, 1, 0))


def _deconv(a):
    return np.ascontiguousarray(np.transpose(a[:, :, ::-1, ::-1],
                                             (2, 3, 0, 1)))


def _conv_inv(a):
    return np.transpose(a, (3, 2, 0, 1))


def _deconv_inv(a):
    return np.ascontiguousarray(
        np.transpose(a, (2, 3, 0, 1))[:, :, ::-1, ::-1])


def _mlp_entries(torch_prefix, flax_path, num_layers):
    """Reference MLP (nets.py:78-91) Sequential linear indices -> our
    MLP's Dense_i (same structure: num_layers=0 is a single Linear)."""
    idx = [0] if num_layers == 0 else [2 * i for i in range(num_layers + 1)]
    out = {}
    for i, t in enumerate(idx):
        dense = flax_path + (f"Dense_{i}",)
        out[f"{torch_prefix}.{t}.weight"] = (dense + ("kernel",), _linear)
        out[f"{torch_prefix}.{t}.bias"] = (dense + ("bias",), _identity)
    return out


def reference_key_mapping(model):
    """torch state_dict key -> (variables path tuple, transform) for a
    LieVAE config, plus the set of ignorable torch keys.

    The ``model`` is the LieVAE whose config determines the reference
    architecture (same config strings build the same torch module tree,
    vae.py:40-132).
    """
    m = {}
    ignore = set()

    # ---- encoder (vae.py:56-70)
    if model.encode_mode == "conv":
        if model.batch_norm:         # ConvNetBN: conv/BN/act triplets,
            # final conv bare (nets.py:33-57)
            conv_idx, bn_idx = [0, 3, 6, 9, 12], [1, 4, 7, 10]
        else:                        # ConvNet: conv/act pairs
            conv_idx, bn_idx = [0, 2, 4, 6, 8], []
        for i, t in enumerate(conv_idx):
            p = ("params", "encoder", f"Conv_{i}")
            m[f"encoder.{t}.weight"] = (p + ("kernel",), _conv)
            m[f"encoder.{t}.bias"] = (p + ("bias",), _identity)
        for i, t in enumerate(bn_idx):
            p = ("params", "encoder", f"BatchNorm_{i}")
            s = ("batch_stats", "encoder", f"BatchNorm_{i}")
            m[f"encoder.{t}.weight"] = (p + ("scale",), _identity)
            m[f"encoder.{t}.bias"] = (p + ("bias",), _identity)
            m[f"encoder.{t}.running_mean"] = (s + ("mean",), _identity)
            m[f"encoder.{t}.running_var"] = (s + ("var",), _identity)
            ignore.add(f"encoder.{t}.num_batches_tracked")
    elif model.encode_mode == "toy":
        # Sequential(Flatten, MLP(.., 100, 2)) -> linears at 1.{0,2,4}
        m.update(_mlp_entries("encoder.1", ("params", "encoder"), 2))
    else:
        raise ValueError(f"unknown encode_mode {model.encode_mode!r}")

    # ---- latent head (vae.py:73-97); ModuleList => 'reparameterize.0.'
    rg = ("params", "rep_group")
    if model.latent_mode == "so3":
        mean = "reparameterize.0.mean_module"
        if model.mean_mode in ("alg", "q", "s2s2"):
            m[f"{mean}.map.weight"] = (rg + ("mean", "Dense_0", "kernel"),
                                       _linear)
            m[f"{mean}.map.bias"] = (rg + ("mean", "Dense_0", "bias"),
                                     _identity)
        elif model.mean_mode == "s2s1":
            for ref_name, ours in (("s2_map", "s2"), ("s1_map", "s1")):
                m[f"{mean}.{ref_name}.weight"] = (
                    rg + ("mean", ours, "kernel"), _linear)
                m[f"{mean}.{ref_name}.bias"] = (
                    rg + ("mean", ours, "bias"), _identity)
        else:
            raise ValueError(f"unknown mean_mode {model.mean_mode!r}")
        inner = "reparameterize.0.reparameterize"
        if model.fixed_sigma is None:
            m[f"{inner}.sigma_linear.weight"] = (rg + ("sigma", "kernel"),
                                                 _linear)
            m[f"{inner}.sigma_linear.bias"] = (rg + ("sigma", "bias"),
                                               _identity)
        else:
            # constant buffer (reparameterize.py:111); the reference's
            # N0reparameterize instantiates sigma_linear unconditionally
            # (reparameterize.py:107) even though fixed_sigma bypasses it
            # in forward — its untrained weights are present but unused
            ignore.add(f"{inner}.fixed_sigma")
            ignore.add(f"{inner}.sigma_linear.weight")
            ignore.add(f"{inner}.sigma_linear.bias")
    elif model.latent_mode == "normal":
        for ref_name, ours in (("mu_linear", "mu"),
                               ("sigma_linear", "sigma")):
            m[f"reparameterize.0.{ref_name}.weight"] = (
                rg + (ours, "kernel"), _linear)
            m[f"reparameterize.0.{ref_name}.bias"] = (
                rg + (ours, "bias"), _identity)
    elif model.latent_mode in ("vmf", "vmfq"):
        for ref_name, ours in (("mu_linear", "mu"), ("k_linear", "k")):
            m[f"reparameterize.0.{ref_name}.weight"] = (
                rg + (ours, "kernel"), _linear)
            m[f"reparameterize.0.{ref_name}.bias"] = (
                rg + (ours, "bias"), _identity)
    else:
        raise ValueError(f"unknown latent_mode {model.latent_mode!r}")

    # the reference registers the reparameterizer twice — as the direct
    # attribute `self.rep_group` AND inside the ModuleList (vae.py:88,102)
    # — so every `reparameterize.0.*` tensor appears again under
    # `rep_group.*`; treat the duplicates as consumed
    for key in [k for k in m if k.startswith("reparameterize.0.")] + \
            [k for k in ignore if k.startswith("reparameterize.0.")]:
        ignore.add("rep_group." + key[len("reparameterize.0."):])

    # ---- decoder (vae.py:105-132)
    dec = ("params", "decoder")
    if model.decoder_mode == "action":
        if model.fixed_item_rep is None:
            m["decoder.item_rep"] = (dec + ("item_rep",), _identity)
        else:                        # registered buffer (decoders.py:37)
            ignore.add("decoder.item_rep")
    elif model.decoder_mode == "mlp":
        m.update(_mlp_entries("decoder.mlp", dec + ("MLP_0",),
                              model.mlp_layers))
    else:
        raise ValueError(f"unknown decoder_mode {model.decoder_mode!r}")
    if model.deconv_mode == "deconv":
        # DeconvNet Sequential: View at 0, ConvTranspose2d at 1,3,5,7,9
        for i, t in enumerate([1, 3, 5, 7, 9]):
            p = dec + ("deconv", f"ConvTranspose_{i}")
            m[f"decoder.deconv.{t}.weight"] = (p + ("kernel",), _deconv)
            m[f"decoder.deconv.{t}.bias"] = (p + ("bias",), _identity)
    # deconv_mode == 'toy' is an empty Sequential: no keys

    return m, ignore


def _mutable(tree):
    """Rebuild a (possibly Frozen) variables tree as plain dicts of
    metadata-only numpy zeros: only shape/dtype are consumed (the import
    is checked complete, every value gets overwritten), so device arrays
    are never pulled to host."""
    try:
        items = tree.items()
    except AttributeError:
        if hasattr(tree, "shape") and hasattr(tree, "dtype"):
            return np.zeros(tree.shape, tree.dtype)
        return np.asarray(tree)
    return {k: _mutable(v) for k, v in items}


def _leaf_paths(tree, prefix=()):
    try:
        items = tree.items()
    except AttributeError:
        return [prefix]
    return [p for k, v in items for p in _leaf_paths(v, prefix + (k,))]


def _get(tree, path):
    for k in path:
        if not isinstance(tree, dict) or k not in tree:
            return None
        tree = tree[k]
    return tree


def _set(tree, path, value):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def import_torch_state_dict(state_dict, model, variables):
    """Map a reference ``VAE.state_dict()`` onto LieVAE ``variables``.

    - ``state_dict``: dict of torch tensors (or arrays) as produced by the
      reference's checkpointing (main.py:122-127);
    - ``model``: the LieVAE whose config matches the checkpoint;
    - ``variables``: a template from ``model.init`` (shapes/dtypes/paths
      are validated against it; non-imported collections pass through).

    Returns a new variables dict. Raises ValueError listing the offending
    keys on any unknown / missing / shape-mismatched tensor.
    """
    mapping, ignore = reference_key_mapping(model)

    unknown = [k for k in state_dict
               if k not in mapping and k not in ignore
               and not k.endswith("num_batches_tracked")]
    missing = [k for k in mapping if k not in state_dict]
    if unknown or missing:
        raise ValueError(
            "state_dict does not match the model config: "
            f"unknown keys {sorted(unknown)}, missing keys {sorted(missing)}."
            " Check latent/decoder/encode/deconv/mean modes, batch_norm,"
            " mlp_layers, fixed_sigma and fixed_item_rep against the"
            " original reference run's flags.")

    out = _mutable(variables)
    bad, assigned = [], set()
    for key, (path, transform) in mapping.items():
        template = _get(out, path)
        if template is None:
            bad.append(f"{key} -> {'/'.join(path)} (no such slot; template"
                       " variables do not match the model config)")
            continue
        value = transform(_np(state_dict[key]))
        if value.shape != template.shape:
            bad.append(f"{key}: got {value.shape}, expected {template.shape}"
                       f" at {'/'.join(path)}")
            continue
        _set(out, path, value.astype(template.dtype))
        assigned.add(path)
    # completeness: every model tensor must come from the checkpoint —
    # a silently untrained submodule would be worse than an error
    unfilled = [
        "/".join(p)
        for coll in ("params", "batch_stats") if coll in out
        for p in _leaf_paths(out[coll], (coll,)) if p not in assigned]
    if unfilled:
        bad.append("model tensors not covered by the checkpoint mapping: "
                   + ", ".join(sorted(unfilled)))
    if bad:
        raise ValueError("torch checkpoint import failed:\n  "
                         + "\n  ".join(bad))
    return jax.tree_util.tree_map(jnp.asarray, out)


_INVERSE = {_identity: _identity, _linear: _linear, _conv: _conv_inv,
            _deconv: _deconv_inv}


def export_torch_state_dict(variables, model):
    """Inverse of :func:`import_torch_state_dict`: flatten a LieVAE
    variables tree into a reference-keyed state_dict (numpy values) that
    the PyTorch reference loads with ``strict=True`` — take a TPU-trained
    model back into the reference ecosystem (its notebook, its eval
    loops).

    Keys the reference registers but does not train are synthesized:
    BatchNorm ``num_batches_tracked`` (0), the duplicate ``rep_group.*``
    registration (aliases of ``reparameterize.0.*``, vae.py:88,102), the
    ``fixed_sigma`` buffer, an untrained ``sigma_linear`` when
    fixed_sigma is set (present but unused, reparameterize.py:107), and
    a fixed ``item_rep`` buffer.
    """
    mapping, _ = reference_key_mapping(model)
    out, bad = {}, []
    for key, (path, transform) in mapping.items():
        value = _get(variables, path)
        if value is None:
            bad.append(f"{'/'.join(path)} (for {key})")
            continue
        out[key] = _INVERSE[transform](np.asarray(value))
    if bad:
        raise ValueError("variables tree is missing tensors required by "
                         "the reference layout: " + ", ".join(sorted(bad)))

    if model.encode_mode == "conv" and model.batch_norm:
        for t in (1, 4, 7, 10):
            out[f"encoder.{t}.num_batches_tracked"] = np.asarray(0)
    if model.latent_mode == "so3" and model.fixed_sigma is not None:
        inner = "reparameterize.0.reparameterize"
        out[f"{inner}.fixed_sigma"] = np.asarray(model.fixed_sigma,
                                                 np.float32)
        in_dims = model._in_dims()
        out[f"{inner}.sigma_linear.weight"] = np.zeros((3, in_dims),
                                                       np.float32)
        out[f"{inner}.sigma_linear.bias"] = np.zeros((3,), np.float32)
    if model.decoder_mode == "action" and model.fixed_item_rep is not None:
        out["decoder.item_rep"] = np.asarray(model.fixed_item_rep,
                                             np.float32)
    # the reference registers the reparameterizer twice (vae.py:88,102)
    for key in [k for k in list(out) if k.startswith("reparameterize.0.")]:
        out["rep_group." + key[len("reparameterize.0."):]] = out[key]
    return out


def save_torch_checkpoint(path, variables, model):
    """``torch.save`` an :func:`export_torch_state_dict` result in the
    reference's checkpoint format (loadable by its ``--continue_epoch``
    path, main.py:72-75)."""
    import torch

    state_dict = {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in export_torch_state_dict(variables,
                                                      model).items()}
    torch.save(state_dict, path)
    return path


def template_variables(model, seed=0):
    """Init a LieVAE variables tree with a dummy input of the model's
    natural shape — the template ``import_torch_state_dict`` validates
    against (the imported tensors replace every value)."""
    if model.encode_mode == "toy":
        x = jnp.zeros((1, (model.degrees + 1) ** 2, model.rep_copies),
                      jnp.float32)
    else:
        x = jnp.zeros((1, 64, 64, 3 if model.rgb else 1), jnp.float32)
    key = jax.random.PRNGKey(seed)
    return model.init({"params": key, "sample": key}, x, n=1, train=False)


def load_torch_checkpoint(path, model, variables=None):
    """``import_torch_state_dict`` over a ``torch.save`` file (the
    reference's ``save_dir/model.pickle``). ``variables`` defaults to a
    fresh ``template_variables(model)``."""
    import torch

    # weights_only: the supported payload is a plain state_dict, so never
    # let torch.load unpickle arbitrary code from an untrusted file
    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    if variables is None:
        variables = template_variables(model)
    return import_torch_state_dict(state_dict, model, variables)
