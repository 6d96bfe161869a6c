"""Import helpers: load reference modules with their unavailable deps stubbed.

The reference's ``utils.py`` imports wget/torchmetrics/torchvision/
tensorboard-summary, which don't all exist here. For golden tests we only need
the *math* modules (ClusterLookup, ContrastiveCorrelationLoss,
UnsupervisedMetrics) — so missing packages are stubbed with minimal fakes
just long enough to import the reference, then the stubs are removed from
``sys.modules`` again. (They must not persist: a fake
``torch.utils.tensorboard.summary`` left behind breaks the REAL
``SummaryWriter`` import that ``scripts/train_segmentation.py`` performs —
its ``writer`` module imports more names from ``summary`` than the fake
carries — and a fake ``matplotlib`` would shadow the real one used by
``depthg_tpu/utils/figures.py``.)
"""

import importlib
import sys
import types

REF = "/root/reference/src"


class _StubSet:
    """Insert fake modules into sys.modules; remove exactly those we added."""

    def __init__(self):
        self.added = []

    def fake(self, name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        try:
            return importlib.import_module(name)  # real module exists: use it
        except ImportError:
            pass
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        self.added.append(name)
        return mod

    def cleanup(self):
        for name in self.added:
            sys.modules.pop(name, None)
        self.added = []


def load_reference_modules():
    """Returns the reference ``modules`` and ``utils`` modules (torch)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)

    import torch

    stubs = _StubSet()
    try:
        stubs.fake("wget", download=lambda *a, **k: None)
        plt = stubs.fake("matplotlib.pyplot", NullFormatter=object)
        stubs.fake("matplotlib", pyplot=plt)

        class _Metric(torch.nn.Module):
            """Minimal torchmetrics.Metric: add_state registers attributes."""

            def __init__(self, dist_sync_on_step=False, **kw):
                super().__init__()

            def add_state(self, name, default=None, dist_reduce_fx=None):
                setattr(self, name, default)

        stubs.fake("torchmetrics", Metric=_Metric)

        tv_models = stubs.fake("torchvision.models")
        import PIL.Image  # noqa: F401  (reference transforms use PIL)

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

        tv_transforms = stubs.fake(
            "torchvision.transforms", Compose=_Compose, Normalize=_Normalize,
            CenterCrop=object, RandomCrop=object, Resize=object,
            ToTensor=object, Lambda=object)
        stubs.fake("torchvision", models=tv_models, transforms=tv_transforms)
        stubs.fake("torch.utils.tensorboard.summary",
                   hparams=lambda *a, **k: (None,) * 3)

        utils = importlib.import_module("utils")
        modules = importlib.import_module("modules")
    finally:
        # reference modules hold direct references to everything they
        # imported; dropping the fakes lets later REAL imports succeed
        stubs.cleanup()
    return modules, utils
