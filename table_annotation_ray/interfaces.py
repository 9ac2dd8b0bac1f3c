"""User-extension surface — typed protocols mirroring the reference's
abstract classes (`annot_scripts/abstract_classes.py:24-120`).

* :class:`KBBackend` ↔ ``AbstractKnowledgeBase`` (abstract_classes.py:24-61):
  implemented by :class:`table_annotation_ray.state.kb.KBReader` (the
  Parquet mini-KB image); swap in a sharded backend by satisfying this
  protocol and passing your instance to :class:`TableAnnotator`.
* :class:`AnnotationModel` ↔ ``AbstractAnnotationModel``
  (abstract_classes.py:96-120): implemented by
  :class:`table_annotation_ray.stages.annotator.TableAnnotator` (the
  4-loop baseline).  An alternative model plugs into the Ray stage by
  constructing it inside ``AnnotateBucket`` — the bucketed-shuffle
  execution shape is model-agnostic.

These are structural (``typing.Protocol``) rather than inheritance-based:
Ray-side stages only ever duck-type against them, so third-party
implementations need no import-time coupling.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable


@runtime_checkable
class KBBackend(Protocol):
    """Query surface the annotator needs from a knowledge base."""

    def is_valid_id(self, entity_id: str) -> bool: ...

    def get_subgraph_of_entity(self, entity_id: str) -> dict[str, dict[str, str]]: ...

    def get_types_of_entity(self, entity_id: str, num_level: int = 1) -> dict[str, dict]: ...

    def get_supertypes_of_type(self, type_id: str) -> dict[str, str]: ...

    def get_label_of_entity(self, entity_id: str) -> str: ...

    def get_num_edges(self, entity_id: str) -> int: ...

    def get_symbol_of_unit_entity(self, unit_entity_id: str): ...

    def prefixing_entity(self, entity: str) -> str: ...

    def map_rank(self, rank: str) -> int: ...


@runtime_checkable
class AnnotationModel(Protocol):
    """Per-table annotation model: table grid + per-cell typings in,
    CEA/CTA/CPA out."""

    def annotate(
        self,
        table: list[list[str]],
        typings: dict[str, list[str]],
        datatypes: dict[str, list[str]],
        first_data_row: int = 0,
    ): ...
