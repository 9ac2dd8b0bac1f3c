"""Arrow IPC / Feather V2 source and sink for Ray Data.

Arrow IPC is the zero-copy interchange format — the natural spill /
handoff format between Arrow-native engines (a Ray Data block IS an
Arrow table, so IPC write/read round-trips blocks byte-exactly,
including list/binary columns that CSV/JSONL mangle).  Both directions
are file-parallel, mirroring ``sources/orc.py``:

* **read** — ``FileBasedDatasource`` subclass; ``_read_stream`` yields
  one block per IPC *record batch*, so a big file streams through the
  object store in batch-sized blocks.  ``columns`` prunes at the
  reader (IPC is columnar; with memory-mapped local files unread
  columns are never touched).
* **write** — ``BlockBasedFileDatasink``: one ``.feather`` file per
  block (IPC file format with zstd), distributed, same resumable
  directory contract as ``write_parquet``.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Union

import ray.data as rd
from ray.data.block import Block, BlockAccessor
from ray.data.datasource import BlockBasedFileDatasink, FileBasedDatasource


class FeatherDatasource(FileBasedDatasource):
    """File-parallel Arrow IPC reader; yields one block per record batch."""

    _FILE_EXTENSIONS = ["feather", "arrow", "ipc"]

    def __init__(
        self,
        paths: Union[str, List[str]],
        columns: Optional[List[str]] = None,
        **kwargs,
    ):
        super().__init__(paths, **kwargs)
        self._columns = list(columns) if columns else None

    def _open_input_source(self, filesystem, path, **open_args):
        # the IPC file format needs the footer — random access required
        return filesystem.open_input_file(path, **open_args)

    def _read_stream(self, f, path: str) -> Iterator[Block]:
        import pyarrow as pa
        import pyarrow.ipc as ipc

        reader = ipc.open_file(f)
        names = reader.schema.names
        if self._columns:
            missing = [c for c in self._columns if c not in names]
            if missing:
                raise ValueError(
                    f"ipc file {path!r} lacks columns {missing}; "
                    f"has {sorted(names)}"
                )
        for i in range(reader.num_record_batches):
            t = pa.Table.from_batches([reader.get_batch(i)])
            if self._columns:
                t = t.select(self._columns)
            yield t


def read_feather(
    paths: Union[str, List[str]],
    columns: Optional[List[str]] = None,
    **kwargs,
) -> rd.Dataset:
    """``ray.data.read_parquet``-shaped Arrow IPC / Feather V2 read
    (file or directory; ``columns`` prunes at the reader)."""
    return rd.read_datasource(
        FeatherDatasource(paths, columns=columns, **kwargs)
    )


class _FeatherDatasink(BlockBasedFileDatasink):
    def __init__(self, path: str, **kwargs):
        super().__init__(path, file_format="feather", **kwargs)

    def write_block_to_file(self, block: BlockAccessor, file) -> None:
        import pyarrow.feather as feather

        feather.write_feather(
            block.to_arrow(), file, compression="zstd"
        )


def write_feather(ds: rd.Dataset, out_dir: str, **kwargs) -> str:
    """Distributed Arrow IPC sink: one Feather V2 (zstd) file per
    block under ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_datasink(_FeatherDatasink(out_dir, **kwargs))
    return out_dir
