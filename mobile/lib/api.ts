/**
 * Serving-API client for the ecgmm_tpu backend
 * (ecgmm_tpu/serve/api.py — POST multipart {file, questionnaire} to
 * /api/public/upload-ecgImage-lead2only; same endpoint contract the
 * reference app expects, /root/reference/Groove/components/
 * SubmitButton.tsx:35-48 cited for the wire format only).
 *
 * The server URL comes from app.json → expo.extra.serverUrl so devices
 * on a LAN can point at the workstation running `python -m
 * ecgmm_tpu.serve.api` without code edits.
 */
import Constants from 'expo-constants'

export const ENDPOINT = '/api/public/upload-ecgImage-lead2only'

export function serverUrl(): string {
  const extra = (Constants.expoConfig?.extra ?? {}) as Record<string, string>
  return extra.serverUrl ?? 'http://localhost:8080'
}

export interface EcgPoint {
  'Voltage (mV)': number
}

export interface FeatureImportance {
  image: number
  signal: number
  age: number
  wt: number
}

export interface DigitizationInfo {
  // how the photo was digitized — "grid" means absolute mV came from
  // the detected 1 mm grid pitch; "assumed" means no grid was found and
  // voltages are only correct up to a scale factor (warn the user)
  scale_source: 'grid' | 'explicit' | 'assumed'
  grid_pitch_px: number | null
  px_per_mv: number
  crop: [number, number, number, number] | null
  ink_fraction: number
}

export interface AnalysisResult {
  label: 'Normal' | 'Abnormal'
  probability: number
  ecg_signal: EcgPoint[]
  heatmap: string // base64 PNG Grad-CAM overlay
  feature_importance: FeatureImportance
  gpt_result: Record<string, string> // five Korean report sections
  digitization?: DigitizationInfo
}

export interface PickedImage {
  uri: string
  fileName?: string | null
  mimeType?: string | null
}

export async function analyzeEcg(
  image: PickedImage,
  questionnaire: Record<string, string>,
): Promise<AnalysisResult> {
  const form = new FormData()
  form.append('file', {
    uri: image.uri,
    name: image.fileName ?? 'ecg.jpg',
    type: image.mimeType ?? 'image/jpeg',
  } as unknown as Blob)
  form.append('questionnaire', JSON.stringify(questionnaire))

  const res = await fetch(serverUrl() + ENDPOINT, {
    method: 'POST',
    body: form,
  })
  if (!res.ok) {
    // the server sends {error: "..."} for 4xx/5xx — surface it so the
    // user sees WHY (bad photo, non-numeric field) instead of a bare
    // status code
    let detail = ''
    try {
      detail = ((await res.json()) as { error?: string }).error ?? ''
    } catch {
      /* non-JSON error body */
    }
    throw new Error(
      `server returned ${res.status}${detail ? `: ${detail}` : ''}`,
    )
  }
  return (await res.json()) as AnalysisResult
}
