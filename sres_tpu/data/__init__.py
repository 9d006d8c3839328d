from sres_tpu.data.batch import BatchDataset, batchDomain  # noqa: F401
from sres_tpu.data.tiles import TileGrid, TileIterator  # noqa: F401
