"""Import helpers: load reference modules with their unavailable deps stubbed.

The reference's ``utils.py`` imports wget/matplotlib/torchmetrics/torchvision/
tensorboard, none of which exist here. For golden tests we only need the
*math* modules (ClusterLookup, ContrastiveCorrelationLoss, UnsupervisedMetrics)
— so the missing packages are stubbed with minimal fakes before import.
"""

import sys
import types

REF = "/root/reference/src"


def _fake(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def load_reference_modules():
    """Returns the reference ``modules`` and ``utils`` modules (torch)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)

    import torch

    _fake("wget", download=lambda *a, **k: None)
    plt = _fake("matplotlib.pyplot", NullFormatter=object)
    _fake("matplotlib", pyplot=plt)

    class _Metric(torch.nn.Module):
        """Minimal torchmetrics.Metric: add_state registers plain attributes."""

        def __init__(self, dist_sync_on_step=False, **kw):
            super().__init__()

        def add_state(self, name, default=None, dist_reduce_fx=None):
            setattr(self, name, default)

    _fake("torchmetrics", Metric=_Metric)

    tv_models = _fake("torchvision.models")
    import PIL.Image

    class _Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    class _Normalize:
        def __init__(self, mean, std):
            self.mean, self.std = mean, std

        def __call__(self, t):
            import torch as _t

            mean = _t.tensor(self.mean).view(-1, 1, 1)
            std = _t.tensor(self.std).view(-1, 1, 1)
            return (t - mean) / std

    tv_transforms = _fake("torchvision.transforms", Compose=_Compose,
                          Normalize=_Normalize, CenterCrop=object,
                          RandomCrop=object, Resize=object, ToTensor=object,
                          Lambda=object)
    _fake("torchvision", models=tv_models, transforms=tv_transforms)
    _fake("torch.utils.tensorboard.summary", hparams=lambda *a, **k: (None,) * 3)

    import importlib

    utils = importlib.import_module("utils")
    modules = importlib.import_module("modules")
    return modules, utils
