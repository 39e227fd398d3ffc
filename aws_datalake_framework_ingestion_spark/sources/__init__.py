"""Sources: JDBC dialect factory, file-landing ops, format readers."""
