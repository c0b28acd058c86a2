from . import fresnel, microfacet, lobes, bsdf  # noqa: F401
