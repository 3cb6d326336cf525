"""Sources & sinks: interleaved-doc synthesizer, readers, exporters."""
