"""Multi-year learned ensemble — one SpectralNetwork per acquisition year.

Capability parity with reference src/models/year.py:9-33, re-designed for
XLA: instead of a Python loop over per-year submodules with a data-dependent
`if x.sum()==0: continue`, the per-year parameters are STACKED on a leading
year axis and the forward is one `nn.vmap` over (params, year-images) with a
masked mean — a single compiled graph regardless of year count, and the
missing-year skip becomes arithmetic instead of control flow.

Mask semantics (`mask_mode`):
  * "batch"  — a year contributes iff its whole batch tensor is non-zero,
               bit-faithful to the reference's `x.sum()==0` skip.
  * "sample" — a year contributes per sample iff that sample's image is
               non-zero (recommended; batch-composition independent).
"""
import flax.linen as nn
import jax.numpy as jnp

from deeptreeattention_tpu.models.hang2020 import SpectralNetwork


class LearnedEnsemble(nn.Module):
    """Mean of per-year spectral-network final-stage scores over valid years.

    Input: images [B, Y, H, W, C] (year-stacked, zero-filled missing years).
    Output: logits [B, classes].
    """

    years: int
    classes: int
    bands: int
    dtype: jnp.dtype = jnp.float32
    mask_mode: str = "batch"

    @nn.compact
    def __call__(self, images, train=False):
        # [B, Y, ...] -> [Y, B, ...] so the year axis lines up with stacked params
        x = jnp.moveaxis(images, 0, 1)

        vmapped = nn.vmap(
            SpectralNetwork,
            in_axes=(0, None),  # (year-stacked images, train flag)
            out_axes=0,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
            methods=["__call__"],
        )
        scores = vmapped(self.bands, self.classes, self.dtype, name="year_models")(
            x, train
        )
        final = scores[-1]  # [Y, B, classes]

        if self.mask_mode == "batch":
            # year y participates iff any sample in the batch has signal
            valid = jnp.any(x != 0, axis=tuple(range(1, x.ndim)))  # [Y]
            mask = valid[:, None].astype(final.dtype)  # [Y, 1]
            mask = jnp.broadcast_to(mask[:, :, None], final.shape)
        else:
            valid = jnp.any(x != 0, axis=tuple(range(2, x.ndim)))  # [Y, B]
            mask = valid[:, :, None].astype(final.dtype)
            mask = jnp.broadcast_to(mask, final.shape)

        total = jnp.sum(final * mask, axis=0)
        count = jnp.maximum(jnp.sum(mask, axis=0), 1.0)
        return total / count


def load_year_backbones(variables, backbone_variables, years):
    """Broadcast a single pre-trained SpectralNetwork backbone into every
    year slot (equivalent of reference src/models/year.py:17-18 loading the
    same `pretrain_state_dict` into each year model), keeping classifiers."""
    import jax

    def tile(leaf_new, leaf_old):
        if leaf_old is None:
            return leaf_new
        return jnp.broadcast_to(leaf_old[None], (years,) + leaf_old.shape).astype(leaf_new.dtype)

    out = {}
    for col, tree in variables.items():
        if col not in backbone_variables:
            out[col] = tree
            continue
        ym = dict(tree)
        inner = dict(ym.get("year_models", {}))
        old = backbone_variables[col]

        def merge(new, old):
            res = {}
            for k, v in new.items():
                if "classifier" in str(k) or k not in old:
                    res[k] = v
                elif isinstance(v, dict):
                    res[k] = merge(v, old[k])
                else:
                    res[k] = tile(v, old[k])
            return res

        ym["year_models"] = merge(inner, dict(old))
        out[col] = ym
    del jax
    return out
