/**
 * Original SVG chart primitives for the result screen (the reference app
 * pulls in react-native-chart-kit; these are self-contained
 * react-native-svg implementations of exactly the two charts the product
 * needs: the scrollable ECG waveform with a Grad-CAM heatmap underlay,
 * and the 4-slice feature-importance pie).
 */
import React from 'react'
import { Image, ScrollView, StyleSheet, Text, View } from 'react-native'
import Svg, { Path, Polyline } from 'react-native-svg'

export function EcgChart({
  voltages,
  heatmapB64,
  showHeatmap,
  width,
  height,
}: {
  voltages: number[]
  heatmapB64?: string
  showHeatmap: boolean
  width: number
  height: number
}) {
  if (voltages.length < 2) return null
  const lo = Math.min(...voltages)
  const hi = Math.max(...voltages)
  const span = hi - lo || 1
  const pts = voltages
    .map((v, i) => {
      const x = (i / (voltages.length - 1)) * width
      const y = height - ((v - lo) / span) * (height - 8) - 4
      return `${x.toFixed(1)},${y.toFixed(1)}`
    })
    .join(' ')

  return (
    <ScrollView horizontal showsHorizontalScrollIndicator>
      <View style={{ width, height }}>
        {showHeatmap && heatmapB64 ? (
          <Image
            source={{ uri: `data:image/png;base64,${heatmapB64}` }}
            style={[StyleSheet.absoluteFill, { opacity: 0.35 }]}
            resizeMode="stretch"
          />
        ) : null}
        <Svg width={width} height={height}>
          <Polyline
            points={pts}
            fill="none"
            stroke="#111827"
            strokeWidth={1.5}
          />
        </Svg>
      </View>
    </ScrollView>
  )
}

export interface PieSlice {
  label: string
  value: number
  color: string
}

function arcPath(cx: number, cy: number, r: number, a0: number, a1: number) {
  const x0 = cx + r * Math.cos(a0)
  const y0 = cy + r * Math.sin(a0)
  const x1 = cx + r * Math.cos(a1)
  const y1 = cy + r * Math.sin(a1)
  const large = a1 - a0 > Math.PI ? 1 : 0
  return `M ${cx} ${cy} L ${x0} ${y0} A ${r} ${r} 0 ${large} 1 ${x1} ${y1} Z`
}

export function ImportancePie({
  slices,
  size,
}: {
  slices: PieSlice[]
  size: number
}) {
  const total = slices.reduce((s, x) => s + Math.max(x.value, 0), 0) || 1
  const r = size / 2 - 4
  let angle = -Math.PI / 2
  const paths = slices.map((s) => {
    const sweep = (Math.max(s.value, 0) / total) * 2 * Math.PI
    const p = { d: arcPath(size / 2, size / 2, r, angle, angle + sweep), color: s.color, key: s.label }
    angle += sweep
    return p
  })
  return (
    <View style={pieStyles.row}>
      <Svg width={size} height={size}>
        {paths.map((p) => (
          <Path key={p.key} d={p.d} fill={p.color} />
        ))}
      </Svg>
      <View style={pieStyles.legend}>
        {slices.map((s) => (
          <View key={s.label} style={pieStyles.legendRow}>
            <View style={[pieStyles.swatch, { backgroundColor: s.color }]} />
            <Text style={pieStyles.legendText}>
              {s.label} {Math.round(s.value)}%
            </Text>
          </View>
        ))}
      </View>
    </View>
  )
}

const pieStyles = StyleSheet.create({
  row: { flexDirection: 'row', alignItems: 'center', gap: 16 },
  legend: { gap: 6 },
  legendRow: { flexDirection: 'row', alignItems: 'center' },
  swatch: { width: 12, height: 12, borderRadius: 3, marginRight: 6 },
  legendText: { fontSize: 13, color: '#111827' },
})
