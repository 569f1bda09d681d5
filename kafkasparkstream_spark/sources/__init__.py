"""Sources & ingest-side operators: Kafka / file / rate streams, JSON parsing."""
