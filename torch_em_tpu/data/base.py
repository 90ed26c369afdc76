"""Torch-free dataset protocol.

The reference builds on ``torch.utils.data.Dataset``; here a dataset is any
object with ``__len__`` / ``__getitem__`` returning numpy samples. This base
class only provides shared niceties (repr, ndim property contract).
"""


class Dataset:
    """Map-style dataset: ``__getitem__(i) -> sample`` plus ``__len__``."""

    def __getitem__(self, index):
        raise NotImplementedError

    def __len__(self):
        raise NotImplementedError

    def __repr__(self):
        try:
            return f"{type(self).__name__}(len={len(self)})"
        except Exception:
            return type(self).__name__
