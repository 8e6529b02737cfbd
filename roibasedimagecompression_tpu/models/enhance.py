"""Shadow enhancement pre-processing (CLAHE on dark LAB regions).

Rebuilds encoder/enhancer/clahe.py: pixels whose 8-bit-scaled L channel is
below `shadow_threshold` form the shadow mask; CLAHE runs over exactly those
pixels gathered into a 1-D sequence (the reference reshapes them to an n x 1
column, which with a 16x16 tile grid is 1-D CLAHE — clahe.py:69-75), then the
enhanced L values scatter back and the image returns to RGB.

The reference imports this before encoding but does not feed the enhanced
image into the codec (rhccq.ipynb cell 4); here it is an optional pre-stage:
`encode(enhance_shadows(img), cfg)`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from roibasedimagecompression_tpu.ops import clahe as CL
from roibasedimagecompression_tpu.ops import colors as COL


def clahe_custom_shadows(
    image_rgb: np.ndarray,
    shadow_mask: np.ndarray,
    clip_limit: float = 4.0,
    tile_size: int = 4,
) -> np.ndarray:
    """Apply CLAHE only to the masked pixels (clahe_custom_shadows,
    enhancer/clahe.py:28-100)."""
    lab = np.asarray(COL.rgb_to_lab_cv2(jnp.asarray(image_rgb)))
    mask = np.asarray(shadow_mask, bool)
    if mask.any():
        shadow_l = lab[..., 0][mask]
        enhanced = np.asarray(
            CL.clahe_1d(jnp.asarray(shadow_l), clip_limit=clip_limit, n_tiles=tile_size)
        )
        lab = lab.copy()
        l_channel = lab[..., 0].copy()
        l_channel[mask] = enhanced
        lab[..., 0] = l_channel
    return np.asarray(COL.lab_cv2_to_rgb(jnp.asarray(lab)))


def enhance_shadows(
    image_rgb: np.ndarray,
    shadow_threshold: int = 100,
    clip_limit: float = 3.0,
    tile_size: int = 16,
) -> np.ndarray:
    """get_enhanced_image (enhancer/clahe.py:8-26): shadow mask = scaled-L <
    threshold, CLAHE over shadow pixels only."""
    lab = np.asarray(COL.rgb_to_lab_cv2(jnp.asarray(image_rgb)))
    shadow_mask = lab[..., 0] < shadow_threshold
    return clahe_custom_shadows(
        image_rgb, shadow_mask, clip_limit=clip_limit, tile_size=tile_size
    )


#: The reference's named CLAHE parameter presets (test_clahe_parameters,
#: encoder/enhancer/clahe.py:261-268).
CLAHE_PRESETS = (
    ("Conservative", {"clip_limit": 2.0, "tile_size": 8}),
    ("Balanced", {"clip_limit": 4.0, "tile_size": 8}),
    ("Aggressive", {"clip_limit": 8.0, "tile_size": 4}),
    ("Fine Detail", {"clip_limit": 6.0, "tile_size": 4}),
    ("Smooth", {"clip_limit": 3.0, "tile_size": 16}),
    ("Personal", {"clip_limit": 3.0, "tile_size": 16}),
)


def clahe_parameter_sweep(
    image_rgb: np.ndarray,
    shadow_mask: np.ndarray,
    combinations=CLAHE_PRESETS,
    figure_path=None,
) -> dict:
    """Run CLAHE over a grid of (clip_limit, tile_size) presets.

    The enhancer parameter-sweep utility (test_clahe_parameters,
    encoder/enhancer/clahe.py:257-293): for each preset, the enhanced image
    and the shadow-region L-channel brightening map.  Returns
    {name: {'enhanced', 'brightening', 'params'}}; with figure_path, also
    writes the reference's 2-row comparison figure.
    """
    import jax.numpy as jnp

    mask = np.asarray(shadow_mask, bool)
    out = {}
    lab_orig = np.asarray(COL.rgb_to_lab_cv2(jnp.asarray(image_rgb)))[..., 0]
    for name, params in combinations:
        enhanced = clahe_custom_shadows(image_rgb, mask, **params)
        lab_enh = np.asarray(COL.rgb_to_lab_cv2(jnp.asarray(enhanced)))[..., 0]
        diff = np.zeros_like(lab_orig, dtype=np.float32)
        diff[mask] = lab_enh[mask].astype(np.float32) - lab_orig[mask]
        out[name] = {"enhanced": enhanced, "brightening": diff, "params": dict(params)}

    if figure_path is not None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = len(out)
        fig, axes = plt.subplots(2, n, figsize=(3.3 * n, 7))
        for col, (name, r) in enumerate(out.items()):
            axes[0, col].imshow(r["enhanced"])
            axes[0, col].set_title(
                f"{name}\nclip {r['params']['clip_limit']}, "
                f"tile {r['params']['tile_size']}", fontsize=8,
            )
            im = axes[1, col].imshow(r["brightening"], cmap="RdYlBu", vmin=0, vmax=80)
            axes[1, col].set_title("brightening", fontsize=8)
            plt.colorbar(im, ax=axes[1, col], fraction=0.046, pad=0.04)
            for row in (0, 1):
                axes[row, col].axis("off")
        fig.tight_layout()
        fig.savefig(figure_path, dpi=100)
        plt.close(fig)
    return out


def clahe_full_image(image_rgb: np.ndarray, clip_limit: float = 3.0, grid: int = 8) -> np.ndarray:
    """Whole-image L-channel CLAHE (the enhancer's non-masked variant,
    enhancer/clahe.py:115-184)."""
    lab = np.asarray(COL.rgb_to_lab_cv2(jnp.asarray(image_rgb)))
    lab = lab.copy()
    lab[..., 0] = np.asarray(
        CL.clahe_2d(jnp.asarray(lab[..., 0]), clip_limit=clip_limit, grid=grid)
    )
    return np.asarray(COL.lab_cv2_to_rgb(jnp.asarray(lab)))
