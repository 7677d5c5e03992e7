/**
 * In-memory handoff of the analysis result between screens. The result
 * carries a base64 PNG heatmap of the full-resolution strip (hundreds of
 * KB to MBs); serializing it into expo-router route params would push it
 * through the URL / navigation state, which breaks on web (URL length
 * limits) and bloats native navigation state. A module-level store keeps
 * navigation params tiny and the payload in JS heap memory.
 */
import type { AnalysisResult } from './api'

let current: AnalysisResult | null = null

export function setResult(r: AnalysisResult): void {
  current = r
}

export function getResult(): AnalysisResult | null {
  return current
}
