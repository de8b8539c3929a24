"""Plan inspection / explain helpers."""
