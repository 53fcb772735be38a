from . import combustion, fakhari, hcz, pulsatile, shan_chen, shan_chen_rt  # noqa: F401
