"""Post-hoc tools (the reference's L5 consumers): subtitle rendering,
twin QA checks, boxdata dumps, SVM label propagation, DAR probing."""
