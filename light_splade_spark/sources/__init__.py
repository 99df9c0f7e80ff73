"""Sources/sinks: NDJSON with strict schemas, web-page corpus adapters."""
