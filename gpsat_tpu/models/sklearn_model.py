"""Placeholder — implemented later this round."""


class _NotYet:
    def __init__(self, *a, **k):
        raise NotImplementedError("model not yet implemented")
SklearnGPRModel = _NotYet
