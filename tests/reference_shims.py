"""Install minimal stand-ins for timm / kornia / torchvision so the reference
implementation at /root/reference can be imported and run as a golden oracle
in parity tests. The shims implement only what the reference actually calls.
"""
import math
import sys
import types

REFERENCE_PATH = '/root/reference'


def _install_timm():
    timm = types.ModuleType('timm')
    models = types.ModuleType('timm.models')
    registry = types.ModuleType('timm.models.registry')
    layers = types.ModuleType('timm.models.layers')
    data = types.ModuleType('timm.data')
    constants = types.ModuleType('timm.data.constants')

    import torch

    def register_model(fn):
        return fn

    def trunc_normal_(tensor, mean=0., std=1., a=-2., b=2.):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(min=a, max=b)
        return tensor

    def drop_path(x, drop_prob=0.0, training=False):
        if drop_prob == 0.0 or not training:
            return x
        keep = 1 - drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        rnd = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
        return x.div(keep) * rnd.floor_()

    def to_2tuple(x):
        if isinstance(x, (tuple, list)):
            return tuple(x)
        return (x, x)

    registry.register_model = register_model
    layers.trunc_normal_ = trunc_normal_
    layers.drop_path = drop_path
    layers.to_2tuple = to_2tuple
    constants.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    constants.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)

    models.registry = registry
    models.layers = layers
    data.constants = constants
    timm.models = models
    timm.data = data
    for name, mod in [('timm', timm), ('timm.models', models),
                      ('timm.models.registry', registry),
                      ('timm.models.layers', layers),
                      ('timm.data', data), ('timm.data.constants', constants)]:
        sys.modules[name] = mod


def _install_kornia():
    import torch
    kornia = types.ModuleType('kornia')
    color = types.ModuleType('kornia.color')

    def hsv_to_rgb(hsv):
        h = (hsv[..., 0, :, :] % (2 * math.pi)) / (2 * math.pi)
        s = hsv[..., 1, :, :]
        v = hsv[..., 2, :, :]
        hi = (torch.floor(h * 6.0) % 6).long()
        f = h * 6.0 - torch.floor(h * 6.0)
        p = v * (1 - s)
        q = v * (1 - f * s)
        t = v * (1 - (1 - f) * s)
        opts = [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)]
        r = torch.zeros_like(v)
        g = torch.zeros_like(v)
        b = torch.zeros_like(v)
        for i, (rr, gg, bb) in enumerate(opts):
            m = hi == i
            r = torch.where(m, rr, r)
            g = torch.where(m, gg, g)
            b = torch.where(m, bb, b)
        return torch.stack([r, g, b], dim=-3)

    color.hsv_to_rgb = hsv_to_rgb
    kornia.color = color
    sys.modules['kornia'] = kornia
    sys.modules['kornia.color'] = color


def _install_torchvision():
    import torch
    tv = types.ModuleType('torchvision')
    transforms = types.ModuleType('torchvision.transforms')
    tvmodels = types.ModuleType('torchvision.models')

    class CenterCrop:
        def __init__(self, size):
            if isinstance(size, int):
                size = (size, size)
            self.size = tuple(size)

        def __call__(self, x):
            th, tw = self.size
            h, w = x.shape[-2:]
            i = int(round((h - th) / 2.0))
            j = int(round((w - tw) / 2.0))
            return x[..., i:i + th, j:j + tw]

    class Resize:
        def __init__(self, size):
            if isinstance(size, int):
                size = (size, size)
            self.size = tuple(size)

        def __call__(self, x):
            return torch.nn.functional.interpolate(
                x.float(), size=self.size, mode='bilinear', align_corners=False)

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    transforms.CenterCrop = CenterCrop
    transforms.Resize = Resize
    transforms.Compose = Compose
    transforms.ToPILImage = lambda *a, **k: (lambda x: x)
    tvmodels.vgg16 = lambda *a, **k: None
    tv.transforms = transforms
    tv.models = tvmodels
    sys.modules['torchvision'] = tv
    sys.modules['torchvision.transforms'] = transforms
    sys.modules['torchvision.models'] = tvmodels


def install():
    """Install all shims and put the reference repo on sys.path."""
    if 'timm' not in sys.modules or not hasattr(sys.modules.get('timm'), 'models'):
        _install_timm()
    if 'kornia' not in sys.modules:
        _install_kornia()
    if 'torchvision' not in sys.modules:
        _install_torchvision()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
