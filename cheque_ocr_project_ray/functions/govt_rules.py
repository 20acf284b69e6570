"""Government payee rule engine (operator M20, SURVEY.md §2.2).

Mirrors ``government_payee_rules.py:127-245``: six ordered rules keyed
on the classification type.  In the reference's main path
(``ocr_engine.py:157-165``) the engine is only invoked when
``is_government`` is True, so rules 4-6 are reachable only via direct
calls — they are implemented (and unit-tested) for full parity.

The entity / pattern / designation tables are the reference's
constants (``government_payee_rules.py:29-125``).
"""

from __future__ import annotations

import re
from typing import Optional

from cheque_ocr_project_ray.functions.classifier import (
    Classification,
    DEMAND_DRAFT,
    GOVT_GOVT_ACCOUNT,
    GOVT_NEGOTIABLE,
    GOVT_NON_TRANSFERABLE,
    MANAGERS_CHEQUE,
)

GOVT_ENTITIES = [
    "GOVERNMENT OF INDIA", "GOVT OF INDIA", "CENTRAL GOVERNMENT",
    "INCOME TAX DEPARTMENT", "CUSTOMS DEPARTMENT", "GST DEPARTMENT",
    "CENTRAL EXCISE", "RAILWAYS", "INDIAN RAILWAYS",
    "DEFENCE", "INDIAN ARMY", "INDIAN NAVY", "INDIAN AIR FORCE",
    "POSTAL DEPARTMENT", "INDIA POST", "TELEGRAPH DEPARTMENT",
    "PUBLIC WORKS DEPARTMENT", "PWD", "CPWD", "NPWD",
    "CENTRAL PUBLIC WORKS", "CENTRAL WATER COMMISSION",
    "STATE GOVERNMENT", "GOVT OF", "SARKAR",
    "ELECTRICITY BOARD", "ELECTRICITY DEPARTMENT", "POWER CORPORATION",
    "WATER BOARD", "JAL BOARD", "IRRIGATION DEPARTMENT",
    "PUBLIC HEALTH ENGINEERING", "PHE",
    "NAGAR PALIKA", "MUNICIPAL CORPORATION", "MUNICIPAL COUNCIL",
    "ZILLA PARISHAD", "PANCHAYAT", "GRAM PANCHAYAT",
    "FOREST DEPARTMENT", "FISHERIES DEPARTMENT",
    "AGRICULTURE DEPARTMENT", "HORTICULTURE DEPARTMENT",
    "HEALTH DEPARTMENT", "MEDICAL SERVICES", "CIVIL HOSPITAL",
    "EDUCATION DEPARTMENT", "SCHOOL EDUCATION", "HIGHER EDUCATION",
    "SOCIAL WELFARE", "WOMEN AND CHILD DEVELOPMENT",
    "TRANSPORT DEPARTMENT", "ROAD TRANSPORT", "RTO",
    "PROPERTY TAX", "HOUSE TAX", "LAND REVENUE",
    "MUNICIPALITY", "MUNICIPAL BOARD", "CANTONMENT BOARD",
    "DEVELOPMENT AUTHORITY", "HOUSING BOARD", "SLUM BOARD",
    "IMPROVEMENT TRUST", "CITY TRUST",
    "PORT TRUST", "PORT AUTHORITY", "AIRPORT AUTHORITY",
    "TOURISM DEVELOPMENT", "INDUSTRIAL DEVELOPMENT",
    "BANK OF INDIA", "STATE BANK OF INDIA", "SBI", "CANARA BANK",
    "PUNJAB NATIONAL BANK", "PNB", "BANK OF BARODA", "BOB",
    "UNION BANK", "INDIAN BANK", "CENTRAL BANK",
    "LIFE INSURANCE CORPORATION", "LIC", "GIC",
    "OIL AND NATURAL GAS", "ONGC", "INDIAN OIL", "IOC",
    "BHARAT PETROLEUM", "BPCL", "HINDUSTAN PETROLEUM", "HPCL",
    "GAIL", "POWER GRID", "NTPC", "NHPC", "SJVN",
    "BHEL", "HAL", "BEL", "BEML", "COAL INDIA", "SAIL",
    "NMDC", "HCL", "NALCO", "MOIL",
]

_GOVT_PAYEE_PATTERNS = [re.compile(p) for p in [
    r"PAY[:\s]*GOVT",
    r"PAY[:\s]*GOVERNMENT",
    r"FAVOUR[:\s]*GOVT",
    r"FAVOUR[:\s]*GOVERNMENT",
    r"TO\s+THE\s+([A-Z\s]+DEPARTMENT)",
    r"([A-Z\s]+BOARD)",
    r"([A-Z\s]+MUNICIPALITY)",
    r"([A-Z\s]+COMMITTEE)",
    r"([A-Z\s]+AUTHORITY)",
    r"([A-Z\s]+TRUST)",
    r"([A-Z\s]+CORPORATION)",
]]

OFFICER_DESIGNATIONS = [
    "SECTION OFFICER", "ACCOUNTS OFFICER", "FINANCE OFFICER",
    "DRAWING AND DISBURSING OFFICER", "DDO",
    "PAY AND ACCOUNTS OFFICER", "PAO",
    "CHIEF ACCOUNTS OFFICER", "FINANCIAL ADVISOR",
    "CONTROLLER OF ACCOUNTS", "DEPUTY CONTROLLER", "ASSISTANT CONTROLLER",
    "SENIOR ACCOUNTS OFFICER", "JUNIOR ACCOUNTS OFFICER",
    "ACCOUNTS ASSISTANT", "TREASURY OFFICER",
    "DEPUTY TREASURY OFFICER", "ASSISTANT TREASURY OFFICER",
    "BANK OFFICER", "SENIOR MANAGER", "CHIEF MANAGER",
    "GENERAL MANAGER", "DEPUTY GENERAL MANAGER",
    "ASSISTANT GENERAL MANAGER", "EXECUTIVE DIRECTOR",
    "DIRECTOR", "JOINT DIRECTOR", "DEPUTY DIRECTOR",
    "ASSISTANT DIRECTOR", "UNDER SECRETARY", "DEPUTY SECRETARY",
    "JOINT SECRETARY", "ADDITIONAL SECRETARY",
    "PRINCIPAL SECRETARY", "CHIEF SECRETARY",
]

_GOVT_INDICATORS = [
    "GOVT", "GOVERNMENT", "MUNICIPAL", "NAGAR", "GRAM",
    "ZILLA", "PANCHAYAT", "ELECTRICITY", "WATER",
    "IRRIGATION", "FOREST", "HEALTH", "EDUCATION",
    "TRANSPORT", "DEVELOPMENT", "AUTHORITY", "BOARD",
    "TRUST", "CORPORATION", "COMMITTEE",
]

_PAYEE_INDICATORS = ["PAY", "PAY TO", "ORDER OF", "FAVOUR OF", "BENEFICIARY"]


def is_government_entity(text: Optional[str]) -> bool:
    """Entity / pattern / indicator detection (government_payee_rules.py:177-207)."""
    if not text:
        return False
    tu = text.upper()
    for entity in GOVT_ENTITIES:
        if entity in tu:
            return True
    for pat in _GOVT_PAYEE_PATTERNS:
        if pat.search(tu):
            return True
    words = tu.split()
    if len(words) <= 4:
        for indicator in _GOVT_INDICATORS:
            if indicator in tu:
                return True
    return False


def _extract_payee_section(text: str) -> Optional[str]:
    """First-indicator split, next 200 chars (government_payee_rules.py:223-235)."""
    for indicator in _PAYEE_INDICATORS:
        if indicator in text:
            parts = text.split(indicator, 1)
            if len(parts) > 1:
                return parts[1][:200]
    return None


def is_payable_to_government(ocr_text: Optional[str]) -> bool:
    """government_payee_rules.py:209-221."""
    if not ocr_text:
        return False
    section = _extract_payee_section(ocr_text.upper())
    if section:
        return is_government_entity(section)
    return False


def _officer_designation_in(text: str) -> Optional[str]:
    """Substring scan over the designation table (government_payee_rules.py:237-245)."""
    tu = text.upper()
    for designation in OFFICER_DESIGNATIONS:
        if designation in tu:
            return designation
    return None


def enforce_payee_rule(
    classification: Classification,
    extracted_payee: Optional[str],
    ocr_full_text: str,
) -> str:
    """Apply the six ordered government payee rules (government_payee_rules.py:127-175)."""
    if not extracted_payee:
        extracted_payee = ""

    if classification.type == GOVT_GOVT_ACCOUNT:
        return "GOVERNMENT"

    if classification.type == GOVT_NON_TRANSFERABLE:
        designation = _officer_designation_in(ocr_full_text)
        if designation:
            return f"GOVERNMENT - {designation}"
        if extracted_payee and any(
            d in extracted_payee.upper() for d in OFFICER_DESIGNATIONS
        ):
            return f"GOVERNMENT - {extracted_payee}"
        return "GOVERNMENT OFFICER"

    if classification.type == GOVT_NEGOTIABLE:
        if is_government_entity(extracted_payee):
            return "GOVERNMENT"
        return extracted_payee or "XXX"

    if classification.type in (DEMAND_DRAFT, MANAGERS_CHEQUE):
        if is_payable_to_government(ocr_full_text):
            return "GOVERNMENT"
        return extracted_payee or "XXX"

    if is_payable_to_government(ocr_full_text):
        return "GOVERNMENT"
    if is_government_entity(extracted_payee):
        return "GOVERNMENT"
    return extracted_payee or "XXX"
