"""Pure-numpy OCR core: no Ray imports anywhere in this subpackage."""
