"""Sources and sinks: table IO and deterministic transcript synthesis."""
