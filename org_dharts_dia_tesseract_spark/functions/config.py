"""Engine configuration registry: the rebuild of the reference's dynamic
variable system (C1-C6).

- typed set/get with a name->type registry and InvalidParameterError on
  unknown names or bad values (TesseractHandle.setVariable:168-177, typed
  getVariable:224-259 supporting Integer/Boolean/Double/String only);
- boolean protocol: the native layer encodes booleans as '0'/'1' or
  'T'/'F'; anything else is an error (TesseractHandle.toBoolean:68-80);
- config presets mirroring tessdata/configs/{hocr,digits,api_config}
  (readConfigFile, TesseractHandle.readConfigFile:335-339);
- language-pack algebra '[~]lang[+[~]lang]*' resolving include/exclude
  sets (TesseractHandle.init:399-459 multi-language spec);
- PSM / OEM closed vocabularies (PublicTypes.java:37-120).

On the Spark side a frozen ConfigRegistry dict is captured by the
Arrow-UDF closures (broadcast by task serialization), so per-task state is
immutable — the documented global-setVariable hazard of the reference
(ImageAnalyzerFactory.java:106-116) cannot occur.
"""

from __future__ import annotations

from ..errors import InvalidParameterError
from ..glyphs import CHARSET
from ..oracle.segment import PSM_MODES

OEM_MODES = ("TESSERACT_ONLY", "CUBE_ONLY", "TESSERACT_CUBE_COMBINED",
             "DEFAULT")   # PublicTypes.java:37-59

# name -> (python type, default)
_VARIABLES: dict[str, tuple[type, object]] = {
    "tessedit_char_whitelist": (str, CHARSET),
    "tessedit_pageseg_mode": (str, "AUTO"),
    "tessedit_ocr_engine_mode": (str, "TESSERACT_ONLY"),
    "tessedit_create_hocr": (bool, False),
    "tessedit_zero_rejection": (bool, False),
    "source_resolution": (int, 96),
    "min_confidence": (float, 0.0),
    "paragraph_gap_min": (int, 5),
    "word_gap_min": (int, 3),
}

PRESETS: dict[str, dict[str, str]] = {
    # tessdata/configs/hocr: `tessedit_create_hocr 1`
    "hocr": {"tessedit_create_hocr": "1"},
    # tessdata/configs/digits: whitelist + zero rejection
    "digits": {"tessedit_char_whitelist": "0123456789-.",
               "tessedit_zero_rejection": "T"},
    # tessdata/configs/api_config is empty of behavior-changing vars
    "api_config": {},
}


def _parse_bool(raw: str) -> bool:
    """Native boolean protocol: 0/1/T/F (TesseractHandle.toBoolean:68-80)."""
    if raw in ("1", "T", "true", "True"):
        return True
    if raw in ("0", "F", "false", "False"):
        return False
    raise InvalidParameterError(
        f"invalid boolean encoding {raw!r}", {"value": raw})


class ConfigRegistry:
    """Validated engine variables; immutable snapshots feed UDF closures."""

    def __init__(self, values: dict[str, object] | None = None):
        self._values: dict[str, object] = {k: d for k, (_, d) in _VARIABLES.items()}
        for k, v in (values or {}).items():
            self.set(k, v)

    def set(self, name: str, value: object) -> None:
        if name not in _VARIABLES:
            raise InvalidParameterError(
                f"unknown variable {name!r}", {name: value})
        typ, _ = _VARIABLES[name]
        if isinstance(value, str) and typ is not str:
            value = self._coerce(name, typ, value)
        if not isinstance(value, typ) or (typ is not bool and isinstance(value, bool)):
            raise InvalidParameterError(
                f"variable {name!r} expects {typ.__name__}", {name: value})
        if name == "tessedit_pageseg_mode" and value not in PSM_MODES:
            raise InvalidParameterError("unknown page seg mode", {name: value})
        if name == "tessedit_ocr_engine_mode" and value not in OEM_MODES:
            raise InvalidParameterError("unknown OCR engine mode", {name: value})
        if name == "source_resolution" and (not isinstance(value, int) or value < 0):
            # ppi < 0 throws (TesseractHandle.setSourceResolution:514-517)
            raise InvalidParameterError("ppi must be non-negative", {name: value})
        self._values[name] = value

    @staticmethod
    def _coerce(name: str, typ: type, raw: str) -> object:
        if typ is bool:
            return _parse_bool(raw)
        try:
            return typ(raw)
        except ValueError as e:
            raise InvalidParameterError(
                f"cannot parse {raw!r} as {typ.__name__}", {name: raw}) from e

    # typed getters mirror getVariable's Integer/Boolean/Double/String
    def get(self, name: str, as_type: type | None = None) -> object:
        if name not in self._values:
            raise InvalidParameterError(f"unknown variable {name!r}", {name: None})
        v = self._values[name]
        if as_type is not None and not isinstance(v, as_type):
            raise InvalidParameterError(
                f"variable {name!r} is not {as_type.__name__}", {name: v})
        return v

    def read_config(self, preset: str) -> None:
        """readConfigFile analog over the named presets."""
        if preset not in PRESETS:
            raise InvalidParameterError(f"unknown config {preset!r}", {preset: None})
        for k, v in PRESETS[preset].items():
            self.set(k, v)

    def snapshot(self) -> dict[str, object]:
        """Immutable copy for UDF closures (printVariables analog)."""
        return dict(self._values)


def read_config_preset(name: str) -> dict[str, object]:
    reg = ConfigRegistry()
    reg.read_config(name)
    return reg.snapshot()


def parse_language_spec(spec: str, available: set[str]) -> tuple[set[str], set[str]]:
    """'[~]lang[+[~]lang]*' -> (loaded, excluded) sets.

    Mirrors the multi-language init spec (TesseractHandle.init:399-459 +
    getLoadedLanguages:289-321): '+' separates terms, '~' excludes.
    Unknown languages raise (init failure -> TesseractException analog).
    """
    include, exclude = set(), set()
    for term in spec.split("+"):
        term = term.strip()
        if not term:
            continue
        neg = term.startswith("~")
        lang = term[1:] if neg else term
        if lang not in available:
            raise InvalidParameterError(f"language pack {lang!r} not found",
                                        {"language": lang})
        (exclude if neg else include).add(lang)
    return include - exclude, exclude


def resolve_languages(spec: str) -> tuple[str, ...]:
    """Resolve a language spec against the INSTALLED glyph atlases
    (glyphs.LANGUAGE_PACKS — the tessdata directory analog) into the
    load ORDER recognition uses: include terms in first-appearance
    order, minus excluded packs. The result feeds recognize_blocks /
    analyze_page, so e.g. 'hin' or 'eng+hin' genuinely changes
    recognized text, mirroring TesseractHandle.init:399-459 loading
    different template packs."""
    from ..glyphs import LANGUAGE_PACKS
    available = set(LANGUAGE_PACKS)
    loaded, _excluded = parse_language_spec(spec, available)
    ordered: list[str] = []
    for term in spec.split("+"):
        term = term.strip()
        if term.startswith("~") or not term:
            continue
        if term in loaded and term not in ordered:
            ordered.append(term)
    if not ordered:
        raise InvalidParameterError(
            "language spec resolves to an empty load set", {"spec": spec})
    return tuple(ordered)
